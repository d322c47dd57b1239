"""Assemble a runnable simulation from a reference-format case directory.

A sediFoam case is an OpenFOAM case dir (0/, constant/, system/) plus an
in.lammps script + IC data file (SURVEY.md L5). This loader reads both
with no modification and produces (SimConfig, FluidState, ParticleState).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.config import (ChannelForcing, CloudConfig, DEMConfig,
                                 FluidConfig, PISOConfig, TurbulenceConfig)
from sedifoam_tpu.dem.state import ParticleState, make_particles
from sedifoam_tpu.fluid.state import FluidBCs, FluidState, init_fluid
from sedifoam_tpu.grid import Grid
from sedifoam_tpu.io import foamdict, lammps
from sedifoam_tpu.solver import SimConfig, adjust_dem_timestep

_BC_TYPE_MAP = {
    "fixedValue": _bc.FIXED_VALUE,
    "zeroGradient": _bc.ZERO_GRADIENT,
    "empty": _bc.EMPTY,
    "cyclic": _bc.CYCLIC,
    "inletOutlet": _bc.INLET_OUTLET,
    "slip": _bc.SLIP,
    "calculated": _bc.ZERO_GRADIENT,
    "fixedFluxPressure": _bc.ZERO_GRADIENT,
    "pressureInletOutletVelocity": _bc.INLET_OUTLET,
    "symmetryPlane": _bc.ZERO_GRADIENT,
    "noSlip": _bc.FIXED_VALUE,
}


@dataclasses.dataclass
class CaseControls:
    dt: float
    end_time: float
    write_interval: float
    start_time: float = 0.0


def _graded_faces(lo: float, hi: float, n: int, ratio: float) -> np.ndarray:
    """simpleGrading face coordinates: ratio = width(last)/width(first)
    (blockMesh expansion-ratio convention), geometric progression."""
    L = hi - lo
    if n == 1 or abs(ratio - 1.0) < 1e-12:
        return lo + (L / n) * np.arange(n + 1)
    r = ratio ** (1.0 / (n - 1))
    w0 = L * (1.0 - r) / (1.0 - r ** n)
    w = w0 * r ** np.arange(n)
    return np.concatenate([[lo], lo + np.cumsum(w)])


class UnsupportedMeshError(ValueError):
    """blockMeshDict outside the tensor-product mesh model.

    The fluid discretization is a structured tensor-product grid (the
    basis of the fast-diagonalization smoothing solver and the XLA-
    friendly stencil ops). Straight-edged hex blocks that tile the box
    as 1-D stacks are supported; curved (arc) edges and O-grid style
    composite blocks — jetFlow's 4-side-blocks-around-a-jet-column
    arrangement (cases/example-cases/jetFlow/constant/polyMesh/
    blockMeshDict:52-56) is the one reference case that uses them —
    are not.
    """


def _parse_blocks(blocks, verts):
    """blocks list -> [(bbox_lo, bbox_hi, counts, grading)] per hex."""
    out = []
    i = 0
    while i < len(blocks):
        if blocks[i] != "hex":
            i += 1
            continue
        vidx = blocks[i + 1]
        counts = blocks[i + 2]
        grading = [1.0, 1.0, 1.0]
        j = i + 3
        if j < len(blocks) and blocks[j] in ("simpleGrading", "edgeGrading"):
            g = blocks[j + 1]
            if blocks[j] == "simpleGrading":
                grading = [float(v) for v in g[:3]]
            else:  # edgeGrading: take the first edge of each direction
                grading = [float(g[0]), float(g[4]), float(g[8])]
            j += 2
        pts = verts[vidx]
        out.append((pts.min(axis=0), pts.max(axis=0),
                    [int(c) for c in counts], grading))
        i = j
    return out


def _merge_block_axes(blocks_info) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-axis face coordinates for hexes tiling a box as a 1-D stack
    (covers every reference multi-block case, e.g. transport-vortex-dune's
    two y-stacked blocks)."""
    axes_faces = []
    for a in range(3):
        segs = {}
        for (lo, hi, counts, grading) in blocks_info:
            key = (round(float(lo[a]), 12), round(float(hi[a]), 12),
                   counts[a], grading[a])
            segs[key] = None
        keys = sorted(segs.keys())
        # contiguity check for stacked segments
        faces = _graded_faces(keys[0][0], keys[0][1], keys[0][2], keys[0][3])
        for k in keys[1:]:
            if abs(k[0] - faces[-1]) > 1e-9 * max(1.0, abs(k[0])):
                raise UnsupportedMeshError(
                    f"hex blocks do not tile the domain as a 1-D stack "
                    f"along axis {a} (segments {keys}): composite/O-grid "
                    f"block arrangements are outside the tensor-product "
                    f"mesh model (see UnsupportedMeshError)")
            faces = np.concatenate(
                [faces, _graded_faces(k[0], k[1], k[2], k[3])[1:]])
        axes_faces.append(faces)
    return tuple(axes_faces)


def read_block_mesh(path: str):
    """blockMeshDict -> (Grid, {patch_name: [face_ids]}).

    face ids: 0..5 = xm, xp, ym, yp, zm, zp. Supports single or 1-D
    stacked multi-hex meshes with simpleGrading (transport-bedload's
    `simpleGrading (1 10 1)`, transport-vortex-dune's two y-blocks).
    """
    d = foamdict.parse_file(path)
    scale = float(d.get("convertToMeters", 1.0))
    verts = np.asarray(d["vertices"], float) * scale
    blocks_info = _parse_blocks(d["blocks"], verts)
    assert blocks_info, "no hex blocks in blockMeshDict"
    edges = d.get("edges", ())
    if any(e == "arc" for e in edges):
        raise UnsupportedMeshError(
            "blockMeshDict uses curved (arc) block edges — the tensor-"
            "product mesh model supports straight-edged hex blocks only "
            "(jetFlow's O-grid jet column is the one reference case "
            "outside it)")
    xf, yf, zf = _merge_block_axes(blocks_info)
    grid = Grid.from_faces(xf, yf, zf)
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)

    def face_id_of_quad(quad: List[int]) -> Optional[int]:
        pts = verts[quad]
        for ax in range(3):
            if np.allclose(pts[:, ax], lo[ax]):
                return 2 * ax
            if np.allclose(pts[:, ax], hi[ax]):
                return 2 * ax + 1
        return None

    patch_faces: Dict[str, List[int]] = {}
    assigned = set()

    def add(name: str, quads):
        ids = patch_faces.setdefault(name, [])
        for q in quads:
            fid = face_id_of_quad(q)
            if fid is not None:
                ids.append(fid)
                assigned.add(fid)

    patches = d.get("patches")
    if patches:
        i = 0
        while i < len(patches):
            # pattern: type name (quads) — `wall walls ((...)(...))`
            ptype, name = patches[i], patches[i + 1]
            quads = patches[i + 2]
            add(name, quads)
            i += 3
    bnd = d.get("boundary")
    if bnd and not patches:
        i = 0
        while i < len(bnd):
            name = bnd[i]
            spec = bnd[i + 1]
            add(name, spec.get("faces", []))
            i += 2

    # unassigned faces -> blockMesh defaultFaces (empty)
    rest = [f for f in range(6) if f not in assigned]
    if rest:
        patch_faces.setdefault("defaultFaces", []).extend(rest)
    return grid, patch_faces


def _parse_uniform_value(entry, n_comp: int):
    """uniformFixedValue uniformValue: constant or `table ((t (v)) ...)`."""
    if isinstance(entry, list) and entry and entry[0] == "table":
        knots = entry[1]
        times, values = [], []
        for knot in knots:
            t = float(knot[0])
            v = knot[1]
            if isinstance(v, list):
                values.append(tuple(float(x) for x in v))
            else:
                values.append((float(v),) * n_comp)
            times.append(t)
        return _bc.TimeTable(tuple(times), tuple(values))
    val = foamdict.uniform_value(entry)
    if isinstance(val, list):
        return tuple(float(v) for v in val)
    return (float(val),) * n_comp


def _read_field_bc(field_file: str, patch_faces: Dict[str, List[int]],
                   n_comp: int) -> Tuple[_bc.FieldBC, object]:
    """0/<field> -> (FieldBC, uniform internal value)."""
    d = foamdict.parse_file(field_file)
    internal = foamdict.uniform_value(d.get("internalField", 0.0))
    bf = d.get("boundaryField", {})

    slots: List[Optional[_bc.PatchBC]] = [None] * 6
    for name, spec in bf.items():
        if name not in patch_faces or not isinstance(spec, dict):
            continue
        kind_str = spec.get("type", "zeroGradient")
        if kind_str == "uniformFixedValue":
            # time-varying uniform value (e.g. the xiaocase1 inlet ramp)
            pb = _bc.PatchBC(_bc.FIXED_VALUE,
                             _parse_uniform_value(spec.get("uniformValue"),
                                                  n_comp))
            for fid in patch_faces[name]:
                slots[fid] = pb
            continue
        kind = _BC_TYPE_MAP.get(kind_str, _bc.ZERO_GRADIENT)
        if kind == _bc.FIXED_VALUE:
            val = foamdict.uniform_value(spec.get("value", 0.0))
        elif kind == _bc.INLET_OUTLET:
            val = foamdict.uniform_value(spec.get("inletValue", 0.0))
        else:
            val = 0.0
        if val == "$internalField":  # OpenFOAM macro expansion
            val = internal
        if isinstance(val, list):
            vt = tuple(float(v) for v in val)
        else:
            vt = (float(val),) * n_comp
        pb = _bc.PatchBC(kind, vt)
        for fid in patch_faces[name]:
            slots[fid] = pb
    default = _bc.PatchBC(_bc.ZERO_GRADIENT, (0.0,) * n_comp)
    return _bc.FieldBC(*(s or default for s in slots)), internal


def load_case(case_dir: str, capacity: Optional[int] = None,
              backend: str = "dense", neighbor_k: Optional[int] = None,
              dtype=jnp.float64):
    """Load a reference case -> (SimConfig, FluidState, ParticleState,
    CaseControls). backend: DEM contact backend ('dense' | 'binned')."""
    sys_d = os.path.join(case_dir, "system")
    const_d = os.path.join(case_dir, "constant")
    zero_d = os.path.join(case_dir, "0")

    grid, patch_faces = read_block_mesh(
        os.path.join(const_d, "polyMesh", "blockMeshDict"))

    control = foamdict.parse_file(os.path.join(sys_d, "controlDict"))
    controls = CaseControls(
        dt=float(control["deltaT"]),
        end_time=float(control["endTime"]),
        write_interval=float(control.get("writeInterval", 1.0)),
        start_time=float(control.get("startTime", 0.0)),
    )

    fv_solution = foamdict.parse_file(os.path.join(sys_d, "fvSolution"))
    piso_d = fv_solution.get("PISO", {})
    p_solver = fv_solution.get("solvers", {}).get("p", {})
    piso = PISOConfig(
        n_correctors=int(piso_d.get("nCorrectors", 2)),
        n_non_orth=int(piso_d.get("nNonOrthogonalCorrectors", 0)),
        p_ref_cell=int(piso_d.get("pRefCell", 0)),
        p_ref_value=float(piso_d.get("pRefValue", 0.0)),
        p_tol=float(p_solver.get("tolerance", 1e-10)),
        p_rel_tol=float(p_solver.get("relTol", 0.0)),
    )

    transport = foamdict.parse_file(os.path.join(const_d,
                                                 "transportProperties"))
    env = foamdict.parse_file(os.path.join(const_d,
                                           "environmentalProperties"))
    g = foamdict.dimensioned_vector(env.get("g", ["g", (0, 0, 0)]))

    turb_file = os.path.join(const_d, "turbulenceProperties")
    turb = TurbulenceConfig(model="laminar")
    if os.path.exists(turb_file):
        td = foamdict.parse_file(turb_file)
        sim_type = td.get("simulationType", "laminar")
        if sim_type == "laminar":
            pass
        elif sim_type in ("RAS", "RASModel") or "RAS" in td:
            model = td.get("RAS", {}).get("RASModel", "kEpsilon") \
                if isinstance(td.get("RAS"), dict) else "kEpsilon"
            if td.get("RAS", {}).get("turbulence", "on") in ("off", False):
                model = "laminar"
            turb = TurbulenceConfig(model=model)
        elif sim_type in ("LES", "LESModel") or "LES" in td:
            les = td.get("LES", {}) if isinstance(td.get("LES"), dict) else {}
            model = les.get("LESModel", "Smagorinsky")
            if les.get("turbulence", "on") in ("off", False):
                model = "laminar"
            turb = TurbulenceConfig(model=model)

    cloud_d = foamdict.parse_file(os.path.join(const_d, "cloudProperties"))
    lod = foamdict.lookup_or_default

    # LAMMPS side
    lmp = lammps.parse_input_script(os.path.join(case_dir, "in.lammps"))
    sub_cycles_req = int(lod(cloud_d, "subCycles", 1))
    dt_dem, sub_cycles, sub_steps = adjust_dem_timestep(
        controls.dt, lmp.dt, sub_cycles_req)

    smooth_dir = lod(cloud_d, "smoothDirection",
                     [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0])
    if isinstance(smooth_dir, list) and len(smooth_dir) == 9:
        smooth_diag = (float(smooth_dir[0]), float(smooth_dir[4]),
                       float(smooth_dir[8]))
    else:
        smooth_diag = (1.0, 1.0, 1.0)

    inlet_force = lod(cloud_d, "inletForce", [0.0, 0.0, 0.0])
    if not isinstance(inlet_force, list):
        inlet_force = [0.0, 0.0, 0.0]

    def box6(key):
        b = lod(cloud_d, key, [0.0] * 9)
        if isinstance(b, list) and len(b) >= 6:
            return tuple(float(x) for x in b[:6])
        return ()

    add_info = lod(cloud_d, "addParticleInfo", [1e-3, 1000.0, 1])
    add_vel = lod(cloud_d, "addParticleVelocity", [0.0, 0.0, 0.0])
    if not isinstance(add_vel, list):
        add_vel = [0.0, 0.0, 0.0]

    cloud_cfg = CloudConfig(
        drag_model=str(lod(cloud_d, "dragModel", "SyamlalOBrien")),
        sub_cycles=sub_cycles,
        sub_steps=sub_steps,
        diffusion_band_width=float(lod(cloud_d, "diffusionBandWidth", 0.006)),
        diffusion_steps=int(lod(cloud_d, "diffusionSteps", 6)),
        smooth_direction=smooth_diag,
        uf_smooth=bool(lod(cloud_d, "UfSmooth", True)),
        up_smooth=bool(lod(cloud_d, "UpSmooth", True)),
        drag_smooth=bool(lod(cloud_d, "dragSmooth", True)),
        alpha_smooth=bool(lod(cloud_d, "alphaSmooth", True)),
        particle_drag=bool(lod(cloud_d, "particleDrag", True)),
        particle_pressure_grad=bool(lod(cloud_d, "particlePressureGrad", True)),
        particle_buoyancy=bool(lod(cloud_d, "particleBuoyancy", False)),
        particle_added_mass=bool(lod(cloud_d, "particleAddedMass", False)),
        particle_lift=bool(lod(cloud_d, "particleLift", False)),
        particle_history_force=bool(lod(cloud_d, "particleHistoryForce", False)),
        lubrication_force=bool(lod(cloud_d, "lubricationForce", False)),
        inlet_force=tuple(float(v) for v in inlet_force),
        inlet_box=box6("inletBox"),
        add_particle=int(lod(cloud_d, "addParticle", 0)),
        add_interval=float(lod(cloud_d, "addParticleTimeStep", 1e30)),
        add_box=box6("addParticleBox"),
        add_info=tuple(add_info[:3]) if isinstance(add_info, list)
        else (1e-3, 1000.0, 1),
        add_velocity=tuple(float(v) for v in add_vel),
        random_perturb=float(lod(cloud_d, "randomPerturb", 0.0)),
        reduce_number_factor=int(lod(cloud_d, "reduceNumberFactor", 1)),
        delete_particle=int(lod(cloud_d, "deleteParticle", 0)),
        delete_box=box6("deleteParticleBox"),
        delete_before_add=int(lod(cloud_d, "deleteBeforeAdd", 0)),
        clear_box=box6("clearInitialBox"),
    )

    # channel forcing (chPressureGrad::initPressureGrad,
    # chPressureGrad.C:48-130): Ubar XOR gradPbar XOR varyingGradP in
    # constant/transportProperties
    forcing = ChannelForcing()

    def _vec(key):
        v = foamdict.dimensioned_vector(transport[key])
        return np.asarray([float(x) for x in v])

    if "Ubar" in transport:
        assert "gradPbar" not in transport, \
            "set only one of Ubar/gradPbar (chPressureGrad.C:53-59)"
        ubar = _vec("Ubar")
        mag = float(np.linalg.norm(ubar))
        forcing = ChannelForcing(mode="Ubar",
                                 flow_direction=tuple(ubar / (mag + 1e-300)),
                                 mag_ubar=mag)
    elif "gradPbar" in transport:
        gp = _vec("gradPbar")
        mag = float(np.linalg.norm(gp))
        dpdt = 0.0
        if "dpdt" in transport:
            dpdt = float(np.linalg.norm(_vec("dpdt")))
        forcing = ChannelForcing(mode="gradPbar",
                                 flow_direction=tuple(gp / (mag + 1e-300)),
                                 grad_pbar=mag, dpdt=dpdt)
    elif "varyingGradP" in transport:
        gp = _vec("varyingGradP")
        mag = float(np.linalg.norm(gp))
        forcing = ChannelForcing(
            mode="varyingGradP",
            flow_direction=tuple(gp / (mag + 1e-300)),
            grad_pbar=mag,
            period=foamdict.dimensioned_value(transport["varyingPeriod"]),
            varying_type=str(transport.get("varyingType", "sinusoidal")))

    # IBM relaxation zone + DNS spectral forcing switches
    # (createIBMForce.H:1-21, createTurbulence.H:29-49: both read from
    # transportProperties; the UOprocess coefficients use OpenFOAM's
    # standard UO* keys)
    def _switch(key):
        v = lod(transport, key, False)
        return str(v).lower() in ("on", "true", "yes", "1")

    add_ibm = _switch("addIBMForce")
    add_dns = _switch("addDNSForce")
    ibm_relax = float(foamdict.dimensioned_value(
        transport["ibmRelaxTime"])) if "ibmRelaxTime" in transport else 0.0

    fluid_cfg = FluidConfig(
        dt=controls.dt,
        forcing=forcing,
        add_ibm_force=add_ibm,
        ibm_relax_time=ibm_relax,
        add_dns_force=add_dns,
        dns_alpha=foamdict.dimensioned_value(lod(transport, "UOalpha", 1.0)),
        dns_sigma=foamdict.dimensioned_value(lod(transport, "UOsigma", 0.1)),
        dns_k_upper=foamdict.dimensioned_value(
            lod(transport, "UOKupper", 1e9)),
        dns_k_lower=foamdict.dimensioned_value(
            lod(transport, "UOKlower", 0.0)),
        rhob=foamdict.dimensioned_value(transport["rhob"]),
        nub=foamdict.dimensioned_value(transport["nub"]),
        rhoa=foamdict.dimensioned_value(transport.get("rhoa", 2000.0)),
        Cvm=foamdict.dimensioned_value(transport.get("Cvm", 0.0)),
        Cl=foamdict.dimensioned_value(transport.get("Cl", 0.0)),
        gravity=tuple(g),
        max_possible_alpha=float(lod(cloud_d, "maxPossibleAlpha", 0.70)),
        piso=piso,
        turbulence=turb,
    )

    d_max = float(np.max(lmp.diameter)) if lmp.diameter is not None else 1e-3
    box = lmp.box if lmp.box else (grid.x0, grid.hi[0], grid.y0, grid.hi[1],
                                   grid.z0, grid.hi[2])
    lub = lmp.lubrication
    if lub is not None:
        lub = dataclasses.replace(lub, box_volume=float(
            (box[1] - box[0]) * (box[3] - box[2]) * (box[5] - box[4])))
    # the binned neighbor table is shared by contact, cohesion, and
    # lubrication: its cutoff must cover the widest interaction ring,
    # and K (slots per particle) must cover the densest packing of that
    # ring or the K-nearest truncation silently drops in-range partners
    # (~5.2 spheres per cubic diameter at random close packing).
    # With contact only, correctness needs all partners within
    # 2*r_max + skin; the default K derives from that bound with ~35%
    # headroom (d_min in the denominator guards polydispersity) —
    # verified bitwise vs the dense backend at just-touching density.
    d_min = float(np.min(lmp.diameter)) if lmp.diameter is not None         else d_max
    skin = 0.3 * d_max
    cutoff = 1.6 * d_max
    if lmp.cohesion is not None:
        cutoff = max(cutoff, d_max + lmp.cohesion.smax + skin)
    if lub is not None:
        cutoff = max(cutoff, lub.cut + skin)
    ring = (d_max + skin) if (lmp.cohesion is None and lub is None) \
        else cutoff
    if neighbor_k is None:
        k_needed = int(max(16, math.ceil(1.35 * 5.2 * (ring / d_min) ** 3)))
        neighbor_k = min(k_needed, 160)
    else:
        k_needed = int(math.ceil(5.5 * (cutoff / d_max) ** 3))
        if k_needed > neighbor_k:
            neighbor_k = min(k_needed, 160)
    if k_needed > 160:
        # the K-nearest table would silently drop in-range partners — be
        # loud instead of clamping quietly (wide cohesion/lubrication
        # rings with small d_min under polydispersity land here)
        import warnings
        warnings.warn(
            f"neighbor table needs K={k_needed} slots to cover the "
            f"interaction ring (cutoff={cutoff:.4g}, d_min={d_min:.4g}) "
            f"but is capped at 160; in-range partners beyond the 160 "
            f"nearest will be DROPPED", stacklevel=2)
    dem_cfg = DEMConfig(
        dt=dt_dem, pair=lmp.pair, walls=lmp.walls, gravity=lmp.gravity,
        carrier_rho=lmp.carrier_rho, cohesion=lmp.cohesion,
        lubrication=lub,
        backend=backend, nbr_k=neighbor_k, max_per_bin=10,
        cutoff=cutoff, skin=skin, audit_ring=ring,
        domain_lo=(box[0], box[2], box[4]),
        domain_hi=(box[1], box[3], box[5]),
        periodic=lmp.periodic,
        frozen_types=lmp.frozen_types,
    )

    # boundary conditions + initial fields
    bcs_alpha, alpha0 = _read_field_bc(os.path.join(zero_d, "alpha"),
                                       patch_faces, 1)
    bcs_p, p0 = _read_field_bc(os.path.join(zero_d, "p"), patch_faces, 1)
    ub_file = os.path.join(zero_d, "Ub")
    if os.path.exists(ub_file):
        bcs_Ub, Ub0 = _read_field_bc(ub_file, patch_faces, 3)
    else:
        # some example cases ship no 0/Ub (e.g. transport-bedload):
        # mirror Ua's patch kinds with no-slip walls, start from rest
        bcs_Ua_tmp, _ = _read_field_bc(os.path.join(zero_d, "Ua"),
                                       patch_faces, 3)
        bcs_Ub = _bc.FieldBC(*(
            _bc.PatchBC(_bc.FIXED_VALUE, (0.0, 0.0, 0.0))
            if bcs_Ua_tmp.patch(p).kind in (_bc.SLIP, _bc.FIXED_VALUE)
            else bcs_Ua_tmp.patch(p)
            for p in _bc.PATCHES))
        Ub0 = 0.0
    ua_file = os.path.join(zero_d, "Ua")
    if os.path.exists(ua_file):
        bcs_Ua, _ = _read_field_bc(ua_file, patch_faces, 3)
    else:
        bcs_Ua = _bc.uniform_bc(_bc.ZERO_GRADIENT, (0.0, 0.0, 0.0))
        # mirror empty patches from Ub
        bcs_Ua = _bc.FieldBC(*(
            _bc.PatchBC(_bc.EMPTY, (0.0, 0.0, 0.0))
            if bcs_Ub.patch(p).kind == _bc.EMPTY else bcs_Ua.patch(p)
            for p in _bc.PATCHES))
    bcs = FluidBCs(alpha=bcs_alpha, p=bcs_p, Ub=bcs_Ub, Ua=bcs_Ua)

    cfg = SimConfig(grid=grid, bcs=bcs, fluid=fluid_cfg, cloud=cloud_cfg,
                    dem=dem_cfg)

    # fluid initial state
    def uniform_field(val, vec=False):
        if vec:
            arr = jnp.zeros((3,) + grid.shape, dtype)
            vals = val if isinstance(val, list) else [0.0, 0.0, 0.0]
            for j in range(3):
                arr = arr.at[j].set(float(vals[j]))
            return arr
        return jnp.full(grid.shape, float(val), dtype)

    fluid = init_fluid(grid,
                       alpha=uniform_field(alpha0),
                       Ub=uniform_field(Ub0, vec=True),
                       p=uniform_field(p0), dtype=dtype)

    # IBM indicator field (createIBMForce.H:25-53 reads 0/ibmIndicator);
    # uniform or nonuniform List<scalar> internal fields supported
    if add_ibm:
        ind_file = os.path.join(zero_d, "ibmIndicator")
        if os.path.exists(ind_file):
            d_ind = foamdict.parse_file(ind_file)
            entry = d_ind.get("internalField", 0.0)
            if isinstance(entry, list) and "nonuniform" in entry:
                # ["nonuniform", "List<scalar>", N, [v0, v1, ...]] in
                # OpenFOAM blockMesh cell order (x fastest: i + j*nx +
                # k*nx*ny) -> our (i, j, k) layout
                inner = next(e for e in entry if isinstance(e, list))
                vals = np.asarray(inner, float)
                ind = jnp.asarray(
                    vals.reshape(grid.nz, grid.ny, grid.nx
                                 ).transpose(2, 1, 0), dtype)
            else:
                ind = jnp.full(grid.shape,
                               float(foamdict.uniform_value(entry)), dtype)
            fluid = fluid._replace(ibm_indicator=ind)

    # particles from the LAMMPS data file
    n = len(lmp.pos)
    vel = None
    if lmp.initial_velocity is not None:
        vel = np.tile(np.asarray(lmp.initial_velocity), (n, 1))
    lat_geom = None
    if backend == "lattice":
        from sedifoam_tpu.dem import lattice as _lat
        lat_geom = _lat.make_geom(dem_cfg)
        # size M to the initial packing with headroom (overflowing a bin
        # silently drops contacts; diagnostics reports lattice_unslotted)
        slot, _ = _lat.bin_slots(lat_geom, jnp.asarray(lmp.pos, dtype),
                                 jnp.ones(n, bool))
        import numpy as _np
        occ = int((_np.asarray(slot) < n).sum(axis=0).max())
        m_needed = max(occ + 2, 4)   # headroom for local densification
        if m_needed != lat_geom.M:
            dem_cfg = dataclasses.replace(dem_cfg, max_per_bin=m_needed)
            cfg = dataclasses.replace(cfg, dem=dem_cfg)
            lat_geom = _lat.make_geom(dem_cfg)
    particles = make_particles(
        pos=lmp.pos, radius=lmp.diameter / 2.0, density=lmp.density,
        vel=vel, ptype=lmp.ptype, tag=lmp.tag,
        capacity=capacity or n, n_walls=len(lmp.walls),
        lattice_geom=lat_geom,
        neighbor_k=neighbor_k if backend == "binned" else None, dtype=dtype)

    return cfg, fluid, particles, controls
