# SPDX-License-Identifier: Apache-2.0
"""Self-contained numpy brute-force neighbor oracle.

Plays the role vesin plays in the reference test-suite
(reference: test/neighborlist/test_utils.py:382-432): an independent, simple
O(N^2 * images) implementation of the neighbor contract that every algorithm
must reproduce:  row ``a`` holds ``(b, S)`` for each periodic image
``r_b + S @ cell`` strictly within the cutoff, excluding the self pair
``(a, a, 0)``.
"""

from __future__ import annotations

import numpy as np


def shift_range(cell: np.ndarray, cutoff: float, pbc) -> np.ndarray:
    inv_t = np.linalg.inv(np.asarray(cell, dtype=np.float64).reshape(3, 3)).T
    d_inv = np.linalg.norm(inv_t, axis=1)
    d_inv = np.where(np.asarray(pbc, dtype=bool).reshape(3), d_inv, 0.0)
    return np.ceil(d_inv * cutoff).astype(int)


def brute_force_neighbors(positions, cutoff, cell=None, pbc=None, extra_margin=1):
    """Return per-row sets of (j, sx, sy, sz) using an oversized shift range."""
    positions = np.asarray(positions, dtype=np.float64)
    n = positions.shape[0]
    if cell is None or pbc is None or not np.asarray(pbc).any():
        cell = np.eye(3)
        srange = np.zeros(3, dtype=int)
    else:
        cell = np.asarray(cell, dtype=np.float64).reshape(3, 3)
        srange = shift_range(cell, cutoff, pbc) + extra_margin
        srange = np.where(np.asarray(pbc, dtype=bool).reshape(3), srange, 0)

    rows = [set() for _ in range(n)]
    for sx in range(-srange[0], srange[0] + 1):
        for sy in range(-srange[1], srange[1] + 1):
            for sz in range(-srange[2], srange[2] + 1):
                s = np.array([sx, sy, sz], dtype=np.float64)
                shifted = positions + s @ cell  # image of every j
                diff = shifted[None, :, :] - positions[:, None, :]
                d2 = np.sum(diff * diff, axis=-1)
                hits = d2 < cutoff * cutoff
                if sx == 0 and sy == 0 and sz == 0:
                    np.fill_diagonal(hits, False)
                for a, b in zip(*np.nonzero(hits)):
                    rows[a].add((int(b), sx, sy, sz))
    return rows


def rows_from_matrix(neighbor_matrix, num_neighbors, shifts=None, fill_value=None):
    """Convert padded outputs into per-row sets of (j, sx, sy, sz)."""
    nm = np.asarray(neighbor_matrix)
    n = nm.shape[0]
    if fill_value is None:
        fill_value = n
    rows = []
    for a in range(n):
        entries = set()
        for k in range(nm.shape[1]):
            j = int(nm[a, k])
            if j == fill_value:
                continue
            if shifts is not None:
                s = tuple(int(v) for v in np.asarray(shifts)[a, k])
            else:
                s = (0, 0, 0)
            entries.add((j,) + s)
        rows.append(entries)
    return rows


def mirror_half_rows(rows):
    """Expand half-filled rows into the full symmetric set."""
    n = len(rows)
    full = [set() for _ in range(n)]
    for a in range(n):
        for (b, sx, sy, sz) in rows[a]:
            full[a].add((b, sx, sy, sz))
            full[b].add((a, -sx, -sy, -sz))
    return full
