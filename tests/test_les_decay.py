"""Physical LES regression: decaying turbulence in a periodic box.

The closed-form identities in test_les_analytic.py pin the Smagorinsky
algebra; this test gates the model's *effect on a resolved flow* — the
gap the round-2 review flagged ("LES validation is analytic-only").
A resolved multi-mode solenoidal field (modes k <= 2 on 24^3 — 12+
points per wavelength so the limitedLinear limiter stays inactive and
scheme dissipation stays small) is advanced with the full PISO step and
the Smagorinsky model on:

(a) resolved kinetic energy decays monotonically;
(b) nut acts on the momentum equation, not just the diagnostic fields:
    the LES run loses >= 1.5x the laminar control's energy (measured
    2.9x) and a non-trivial fraction of the initial energy;
(c) budget closure: window by window, the measured decay rate equals
    modeled dissipation <2 (nu+nut)|symm|^2> plus the scheme
    dissipation estimated from the laminar control (measured residual
    <= 0.15 of the decay rate; gated at 0.35 — the trajectories
    diverge, so the laminar eps_num estimate degrades in time);
(d) the modeled dissipation is the majority of the measured decay
    (measured 0.70; gated > 0.5) and dominates molecular by > 50x;
(e) mySmagorinsky at beta == 1 reproduces Smagorinsky exactly. (Our
    mySmagorinsky applies the phase weight beta directly to nut
    (turbulence.py:84); the reference's mySmagorinsky.C correctNut is
    plain Ck*delta*sqrt(k) with phase weighting entering via the
    templated phase turbulence model — both coincide with Smagorinsky
    at alpha = 0.)

The reference exercises Smagorinsky only in situ (createTurbulence.H:16-27
inside the Mueller cases); this is the isolated LES gate it lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sedifoam_tpu import bc as _bc
from sedifoam_tpu.config import FluidConfig, PISOConfig, TurbulenceConfig
from sedifoam_tpu.fluid import turbulence as _turb
from sedifoam_tpu.fluid.state import FluidBCs, init_fluid
from sedifoam_tpu.fluid.step import fluid_step
from sedifoam_tpu.grid import Grid

N = 24
L = 1.0
NU = 1e-5          # molecular Re ~ 1e5: negligible vs SGS
DT = 1e-3
N_STEPS = 100
SAMPLE = 10        # steps per ke/dissipation sample (shared: _run + gates)
KMAX = 2           # IC modes 1..KMAX: 12+ points/wavelength at 24^3


def _box(n=N):
    grid = Grid(nx=n, ny=n, nz=n, dx=L / n, dy=L / n, dz=L / n)
    cyc = _bc.PatchBC(_bc.CYCLIC)
    cyc3 = _bc.PatchBC(_bc.CYCLIC, (0.0, 0.0, 0.0))
    bcs = FluidBCs(alpha=_bc.FieldBC(*(cyc,) * 6),
                   p=_bc.FieldBC(*(cyc,) * 6),
                   Ub=_bc.FieldBC(*(cyc3,) * 6),
                   Ua=_bc.FieldBC(*(cyc3,) * 6))
    return grid, bcs


def _solenoidal_ic(grid, kmax=KMAX):
    """U = curl(A) for a random few-mode vector potential: analytically
    divergence-free and resolved (k <= kmax), so the TVD limiter stays
    inactive and scheme dissipation stays small relative to SGS."""
    rng = np.random.RandomState(7)
    x, y, z = np.meshgrid(grid.axis_centers(0), grid.axis_centers(1),
                          grid.axis_centers(2), indexing="ij")
    U = np.zeros((3,) + grid.shape)
    two_pi = 2.0 * np.pi / L
    for _ in range(8):
        k = rng.randint(1, kmax + 1, size=3) * two_pi
        phase = rng.uniform(0, 2 * np.pi, size=3)
        amp = rng.uniform(-1.0, 1.0, size=3) / np.linalg.norm(k)
        # A_i = amp_i * sin(k.x + phi_i); U = curl A term by term
        arg = k[0] * x + k[1] * y + k[2] * z
        c = [np.cos(arg + phase[i]) for i in range(3)]
        U[0] += k[1] * amp[2] * c[2] - k[2] * amp[1] * c[1]
        U[1] += k[2] * amp[0] * c[0] - k[0] * amp[2] * c[2]
        U[2] += k[0] * amp[1] * c[1] - k[1] * amp[0] * c[0]
    U *= 1.0 / np.sqrt(np.mean(U ** 2))                 # u_rms = 1
    return jnp.asarray(U)


def _ke(fs):
    return float(0.5 * jnp.mean(jnp.sum(fs.Ub ** 2, axis=0)))


def _run(model, grid, bcs, U0, n_steps=N_STEPS, sample=SAMPLE):
    cfg = FluidConfig(
        dt=DT, rhob=1.0, nub=NU,
        piso=PISOConfig(n_correctors=1, p_tol=1e-9, p_max_iter=400),
        turbulence=TurbulenceConfig(model=model))
    fs = init_fluid(grid, Ub=U0)
    step = jax.jit(lambda f: fluid_step(f, grid, bcs, cfg))
    fs = step(fs)  # first step projects the IC onto the discrete
    ke = [_ke(fs)]  # div-free space; measure decay from there
    diss = []
    for i in range(n_steps):
        fs = step(fs)
        if (i + 1) % sample == 0:
            ke.append(_ke(fs))
            S2 = _turb._strain_rate_sq(fs.Ub, grid, bcs.Ub)  # 2|symm|^2
            diss.append(float(jnp.mean((NU + fs.nut) * S2)))
    return fs, np.array(ke), np.array(diss)


@pytest.mark.slow
def test_smagorinsky_decay_physics():
    grid, bcs = _box()
    U0 = _solenoidal_ic(grid)

    fs_les, ke_les, diss_les = _run("Smagorinsky", grid, bcs, U0)
    _, ke_lam, diss_lam = _run("laminar", grid, bcs, U0)

    # (a) monotone resolved-KE decay
    assert np.all(np.diff(ke_les) < 0.0), ke_les
    assert np.isfinite(ke_les).all()

    # (b) the SGS model must dominate the laminar control: require the
    # LES to dissipate >= 1.5x the laminar run's energy loss (measured
    # 2.9x; laminar loss here is almost entirely scheme dissipation —
    # NU alone would decay KE by < 1% over the run)
    loss_les = ke_les[0] - ke_les[-1]
    loss_lam = ke_lam[0] - ke_lam[-1]
    assert loss_les > 1.5 * loss_lam, (loss_les, loss_lam)
    assert loss_les > 0.10 * ke_les[0], (loss_les, ke_les[0])

    # (c) budget closure: over each sampling window the decay rate must
    # equal modeled dissipation + scheme dissipation (estimated window
    # by window from the laminar control, whose modeled part is
    # negligible). Window alignment: ke[i] and diss[i-1] are sampled at
    # the same time, so window i (ke[i] -> ke[i+1]) starts at diss[i-1]
    # — pair dke[1:] with diss[:-1].
    t_win = SAMPLE * DT
    dke = (-np.diff(ke_les) / t_win)[1:]          # measured decay rate
    eps_mod = diss_les[:-1]                       # start-of-window model
    eps_num = (-np.diff(ke_lam) / t_win)[1:] - diss_lam[:-1]
    resid = np.abs(dke - eps_mod - eps_num)
    assert np.all(resid < 0.35 * dke), (dke, eps_mod, eps_num)
    # (d) the modeled part is the majority of the decay...
    assert eps_mod.sum() > 0.5 * dke.sum(), (eps_mod.sum(), dke.sum())
    # ... and dominates molecular dissipation by > 50x
    assert np.all(diss_lam < diss_les / 50.0 + 1e-30) or \
        float(np.mean(diss_lam / diss_les)) < 0.02, (diss_lam, diss_les)

    # nut is nonnegative and active
    assert float(fs_les.nut.min()) >= 0.0
    assert float(fs_les.nut.max()) > NU


@pytest.mark.slow
def test_mysmagorinsky_beta1_matches_smagorinsky():
    # beta = 1 - alpha = 1 everywhere (alpha=0): the beta-weighted
    # variant must reproduce plain Smagorinsky bit-for-bit on the same
    # trajectory (our mySmagorinsky multiplies nut by beta,
    # turbulence.py:84; at beta=1 it is Smagorinsky).
    grid, bcs = _box(n=12)
    U0 = _solenoidal_ic(grid)
    _, ke_a, _ = _run("Smagorinsky", grid, bcs, U0, n_steps=30)
    _, ke_b, _ = _run("mySmagorinsky", grid, bcs, U0, n_steps=30)
    np.testing.assert_allclose(ke_a, ke_b, rtol=1e-12)
