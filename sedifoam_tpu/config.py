"""Unified static configuration (frozen dataclasses, hashable, jit-static).

One config tree replaces the reference's two config stacks: the OpenFOAM
dictionaries (constant/{transportProperties,cloudProperties,...},
system/{controlDict,fvSolution,...}) and the LAMMPS input script
(in.lammps + data file). io/foam.py and io/lammps.py populate it from the
reference's own case files so the auto-testing cases run unmodified.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# DEM
# ---------------------------------------------------------------------------

PAIR_NONE = "none"
PAIR_HOOKE = "hooke"
PAIR_HOOKE_HISTORY = "hooke_history"
PAIR_HERTZ_HISTORY = "hertz_history"  # the reference's gran/hertzFix/history


@dataclasses.dataclass(frozen=True)
class PairParams:
    """Granular contact parameters (pair_style gran/... settings).

    LAMMPS defaulting rules (pair_gran_hertzFix_history.cpp:293-317):
    kt = NULL -> 2/7 kn; gammat = NULL -> 0.5 gamman; dampflag 0 -> gammat=0.
    """

    style: str = PAIR_NONE
    kn: float = 0.0
    kt: Optional[float] = None
    gamman: float = 0.0
    gammat: Optional[float] = None
    xmu: float = 0.0
    dampflag: int = 1

    def resolved(self) -> "PairParams":
        kt = self.kn * 2.0 / 7.0 if self.kt is None else self.kt
        gammat = 0.5 * self.gamman if self.gammat is None else self.gammat
        if self.dampflag == 0:
            gammat = 0.0
        return dataclasses.replace(self, kt=kt, gammat=gammat)


WALL_XPLANE = "xplane"
WALL_YPLANE = "yplane"
WALL_ZPLANE = "zplane"
WALL_ZCYLINDER = "zcylinder"

_WALL_AXIS = {WALL_XPLANE: 0, WALL_YPLANE: 1, WALL_ZPLANE: 2}


@dataclasses.dataclass(frozen=True)
class WallSpec:
    """One fix wall/gran (interfaceToLammps/fix_wall_granFix.cpp)."""

    style: str
    lo: Optional[float] = None   # None == LAMMPS NULL (no wall on that side)
    hi: Optional[float] = None
    cylradius: float = 0.0
    params: PairParams = PairParams()
    # optional wall motion
    wiggle: bool = False
    wiggle_axis: int = 0
    amplitude: float = 0.0
    period: float = 0.0
    vshear: float = 0.0
    shear_axis: int = -1

    @property
    def axis(self) -> int:
        return _WALL_AXIS.get(self.style, 2)


@dataclasses.dataclass(frozen=True)
class DEMConfig:
    dt: float
    pair: PairParams = PairParams()
    walls: Tuple[WallSpec, ...] = ()
    gravity: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # fix fdrag carrier density (0 disables per-substep added mass,
    # fix_fluid_drag.cpp:49-54)
    carrier_rho: float = 0.0
    # cohesion (fix cohesive), None = off
    cohesion: Optional["CohesionParams"] = None


@dataclasses.dataclass(frozen=True)
class CohesionParams:
    """fix cohesive: van der Waals (interfaceToLammps/fix_cohesive.cpp)."""

    ah: float = 0.0       # Hamaker constant
    lam: float = 0.0      # London retardation wavelength
    smin: float = 0.0     # minimum separation cutoff
    smax: float = 0.0     # maximum separation cutoff
    model: int = 0        # 0 = retarded, 1 = unretarded
