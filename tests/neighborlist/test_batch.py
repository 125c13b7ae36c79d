# SPDX-License-Identifier: Apache-2.0
"""Batched neighbor lists must reproduce per-system results."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.neighborlist import (
    batch_cell_list,
    batch_naive_neighbor_list,
    batch_naive_neighbor_list_dual_cutoff,
    naive_neighbor_list,
    neighbor_list,
)

from .oracle import brute_force_neighbors, rows_from_matrix


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    sizes = [20, 35, 12]
    cells = [
        np.eye(3) * 5.0,
        np.diag([6.0, 7.0, 5.5]),
        np.array([[6.0, 0, 0], [0.8, 5.0, 0], [0, 0.5, 6.5]]),
    ]
    positions, batch_idx = [], []
    for b, (n, c) in enumerate(zip(sizes, cells)):
        positions.append(rng.uniform(0, 1, (n, 3)) @ c)
        batch_idx += [b] * n
    return (
        np.concatenate(positions),
        np.asarray(cells),
        np.asarray(batch_idx, dtype=np.int32),
        sizes,
    )


def per_system_expected(pos, cells, batch_idx, sizes, cutoff, pbc):
    """Concatenated per-system oracle rows with global indices."""
    rows = []
    off = 0
    for b, n in enumerate(sizes):
        sub = brute_force_neighbors(
            pos[off:off + n], cutoff,
            cells[b] if pbc is not None else None,
            pbc[b] if pbc is not None else None,
        )
        for r in sub:
            rows.append({(j + off, sx, sy, sz) for (j, sx, sy, sz) in r})
        off += n
    return rows


@pytest.mark.parametrize("periodic", [False, True])
def test_batch_naive_matches_per_system(periodic):
    pos, cells, batch_idx, sizes = make_batch(1)
    cutoff = 2.4
    pbc = np.tile([True, True, True], (3, 1)) if periodic else None
    out = batch_naive_neighbor_list(
        jnp.asarray(pos), cutoff,
        pbc=pbc, cell=jnp.asarray(cells) if periodic else None,
        batch_idx=jnp.asarray(batch_idx),
    )
    if periodic:
        nm, num, sh = out
        got = rows_from_matrix(nm, num, sh)
    else:
        nm, num = out
        got = rows_from_matrix(nm, num)
    expected = per_system_expected(
        pos, cells, batch_idx, sizes, cutoff, pbc
    )
    assert got == expected


def test_batch_cell_list_matches_batch_naive():
    pos, cells, batch_idx, sizes = make_batch(2)
    cutoff = 2.1
    pbc = np.tile([True, True, True], (3, 1))
    nm_c, num_c, sh_c = batch_cell_list(
        jnp.asarray(pos), cutoff, jnp.asarray(cells), pbc,
        batch_idx=jnp.asarray(batch_idx),
    )
    expected = per_system_expected(pos, cells, batch_idx, sizes, cutoff, pbc)
    assert rows_from_matrix(nm_c, num_c, sh_c) == expected


def test_batch_mixed_pbc():
    pos, cells, batch_idx, sizes = make_batch(3)
    cutoff = 2.0
    pbc = np.array([[True, True, True], [True, False, True], [False, False, False]])
    nm, num, sh = batch_cell_list(
        jnp.asarray(pos), cutoff, jnp.asarray(cells), pbc,
        batch_idx=jnp.asarray(batch_idx),
    )
    expected = per_system_expected(pos, cells, batch_idx, sizes, cutoff, pbc)
    assert rows_from_matrix(nm, num, sh) == expected


def test_batch_dual_cutoff():
    pos, cells, batch_idx, sizes = make_batch(4)
    c1, c2 = 1.5, 2.5
    pbc = np.tile([True, True, True], (3, 1))
    nm1, num1, sh1, nm2, num2, sh2 = batch_naive_neighbor_list_dual_cutoff(
        jnp.asarray(pos), c1, c2, pbc=pbc, cell=jnp.asarray(cells),
        batch_idx=jnp.asarray(batch_idx),
    )
    assert rows_from_matrix(nm1, num1, sh1) == per_system_expected(
        pos, cells, batch_idx, sizes, c1, pbc
    )
    assert rows_from_matrix(nm2, num2, sh2) == per_system_expected(
        pos, cells, batch_idx, sizes, c2, pbc
    )


def test_dispatcher_batch_routing():
    pos, cells, batch_idx, sizes = make_batch(5)
    cutoff = 2.0
    pbc = np.tile([True, True, True], (3, 1))
    out_a = neighbor_list(
        jnp.asarray(pos), cutoff, cell=jnp.asarray(cells), pbc=pbc,
        batch_idx=jnp.asarray(batch_idx),
    )
    out_b = batch_naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=pbc, cell=jnp.asarray(cells),
        batch_idx=jnp.asarray(batch_idx),
    )
    assert rows_from_matrix(*[out_a[0], out_a[1], out_a[2]]) == rows_from_matrix(
        out_b[0], out_b[1], out_b[2]
    )


def test_batch_ptr_only():
    pos, cells, batch_idx, sizes = make_batch(6)
    cutoff = 2.0
    ptr = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
    nm_a, num_a = batch_naive_neighbor_list(
        jnp.asarray(pos), cutoff, batch_ptr=jnp.asarray(ptr)
    )
    nm_b, num_b = batch_naive_neighbor_list(
        jnp.asarray(pos), cutoff, batch_idx=jnp.asarray(batch_idx)
    )
    assert rows_from_matrix(nm_a, num_a) == rows_from_matrix(nm_b, num_b)
