"""Full-state checkpoint/resume.

Strictly better than the reference (SURVEY.md §5.4): the whole coupled
state is one pytree, so a checkpoint captures everything — including the
DEM contact shear history LAMMPS cannot restart
(softParticleCloud.C:525-528) — in one atomic npz file.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sedifoam_tpu.solver import SimState


def save(path: str, state: SimState) -> None:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load(path: str, template: SimState) -> SimState:
    """Restore into the structure of `template` (shapes must match)."""
    leaves, treedef = jax.tree.flatten(template)
    with np.load(path) as data:
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            assert arr.shape == leaf.shape, (
                f"checkpoint leaf {i}: {arr.shape} != {leaf.shape}")
            new_leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree.unflatten(treedef, new_leaves)
