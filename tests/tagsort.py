"""Test helper: compare particle SoAs by tag (the binned backend re-sorts
rows by bin at every rebuild; identity is the tag, not the row)."""

import numpy as np


def by_tag(state, *fields):
    """Return the given (N,...) fields of a ParticleState sorted by tag.

    Only ACTIVE rows are returned, so states of different capacity
    compare directly.
    """
    tag = np.asarray(state.tag)
    act = np.asarray(state.active)
    rows = np.where(act)[0]
    order = rows[np.argsort(tag[rows], kind="stable")]
    out = []
    for f in fields:
        out.append(np.asarray(getattr(state, f))[order])
    return out if len(out) > 1 else out[0]
