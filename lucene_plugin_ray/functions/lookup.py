"""Validated sorted-key lookup — THE broadcast-dimension resolve kernel.

Every broadcast-join / model-lookup map pass in the repo resolves probe
values against a sorted key array with ``np.searchsorted`` and must fail
LOUDLY on a miss (a dangling foreign key / out-of-model value) instead of
silently taking a neighbor's position.  One definition so the boundary
check (the ``np.minimum`` clamp guarding the equality probe) cannot drift
between call sites (relational dims, charlm model, length_rank histogram).
"""

from __future__ import annotations

import numpy as np

__all__ = ["lookup_positions"]


def lookup_positions(
    sorted_keys: np.ndarray, probe: np.ndarray, missing_msg: str
) -> np.ndarray:
    """Positions of ``probe`` values in ``sorted_keys`` (ascending, int64);
    raises ``ValueError(missing_msg)`` if any probe value is absent."""
    pos = np.searchsorted(sorted_keys, probe)
    if probe.size and not (
        (pos < sorted_keys.size).all()
        and (sorted_keys[np.minimum(pos, sorted_keys.size - 1)] == probe).all()
    ):
        raise ValueError(missing_msg)
    return pos
