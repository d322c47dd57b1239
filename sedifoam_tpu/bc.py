"""Boundary conditions on the six box patches.

Replicates the fvPatchField zoology the reference cases use
(e.g. cases/auto-testing/test-cases/xiaocase3/0/{Ub,alpha,p}):
fixedValue, zeroGradient, empty, cyclic, inletOutlet.

BC specs are frozen dataclasses with scalar tuples for values, so a full
``FieldBC`` is hashable and can be closed over as a static argument under
``jax.jit`` — no recompiles, no traced control flow.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

FIXED_VALUE = "fixedValue"
ZERO_GRADIENT = "zeroGradient"
EMPTY = "empty"
CYCLIC = "cyclic"
INLET_OUTLET = "inletOutlet"
SLIP = "slip"  # zero normal component, zeroGradient tangential

# patch ids in canonical order
PATCHES = ("xm", "xp", "ym", "yp", "zm", "zp")


@dataclasses.dataclass(frozen=True)
class TimeTable:
    """Piecewise-linear time-varying uniform BC value (OpenFOAM
    uniformFixedValue with a table, e.g. xiaocase1/0/Ub inlet ramp).

    Static (hashable); evaluation with a traced time produces a traced
    value, so table BCs are jit-safe with no recompiles.
    """

    times: Tuple[float, ...]
    values: Tuple[Tuple[float, ...], ...]  # one tuple per time knot

    def at(self, t, comp: int):
        import jax.numpy as jnp
        ts = jnp.asarray(self.times)
        vs = jnp.asarray([v[comp] if len(v) > 1 else v[0]
                          for v in self.values])
        return jnp.interp(t, ts, vs)

    @property
    def n_comp(self) -> int:
        return max(len(v) for v in self.values)

    def map_values(self, fn) -> "TimeTable":
        return TimeTable(self.times,
                         tuple(tuple(fn(x) for x in v) for v in self.values))

    def component(self, i: int) -> "TimeTable":
        return TimeTable(self.times, tuple(
            (v[i] if len(v) > 1 else v[0],) for v in self.values))


@dataclasses.dataclass(frozen=True)
class PatchBC:
    kind: str
    # uniform value (1-tuple for scalars, 3-tuple for vectors) or a
    # TimeTable; for inletOutlet this is the inletValue.
    value: Union[Tuple[float, ...], TimeTable] = (0.0,)

    def component(self, i: int) -> "PatchBC":
        if isinstance(self.value, TimeTable):
            return PatchBC(self.kind, self.value.component(i))
        v = self.value[i] if len(self.value) > 1 else self.value[0]
        return PatchBC(self.kind, (v,))

    def value_at(self, t, comp: int = 0):
        """Uniform value at time t (traced-safe); scalar fields comp=0."""
        if isinstance(self.value, TimeTable):
            return self.value.at(t, comp)
        return self.value[comp] if len(self.value) > comp else self.value[0]


@dataclasses.dataclass(frozen=True)
class FieldBC:
    xm: PatchBC = PatchBC(ZERO_GRADIENT)
    xp: PatchBC = PatchBC(ZERO_GRADIENT)
    ym: PatchBC = PatchBC(ZERO_GRADIENT)
    yp: PatchBC = PatchBC(ZERO_GRADIENT)
    zm: PatchBC = PatchBC(ZERO_GRADIENT)
    zp: PatchBC = PatchBC(ZERO_GRADIENT)

    def patch(self, name: str) -> PatchBC:
        return getattr(self, name)

    def axis(self, axis: int) -> Tuple[PatchBC, PatchBC]:
        """(minus-side, plus-side) patches for an axis."""
        return (
            self.patch(PATCHES[2 * axis]),
            self.patch(PATCHES[2 * axis + 1]),
        )

    def component(self, i: int) -> "FieldBC":
        return FieldBC(*(self.patch(p).component(i) for p in PATCHES))


def uniform_bc(kind: str, value=0.0) -> FieldBC:
    v = value if isinstance(value, tuple) else (float(value),)
    return FieldBC(*(PatchBC(kind, v) for _ in PATCHES))


def zero_gradient() -> FieldBC:
    return uniform_bc(ZERO_GRADIENT)


def make_field_bc(patches: dict, default: Optional[PatchBC] = None) -> FieldBC:
    """Build a FieldBC from a {patch_name: PatchBC} dict."""
    default = default or PatchBC(ZERO_GRADIENT)
    return FieldBC(*(patches.get(p, default) for p in PATCHES))
