# SPDX-License-Identifier: Apache-2.0
"""Cell-list tests: oracle agreement, build/query split, rebuild detection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.neighborlist import (
    build_cell_list,
    cell_list,
    cell_list_needs_rebuild,
    estimate_cell_list_sizes,
    neighbor_list_needs_rebuild,
    query_cell_list,
)

from .oracle import brute_force_neighbors, mirror_half_rows, rows_from_matrix


def crystal(n_rep, a=3.0, jitter=0.1, seed=0):
    """Simple-cubic crystal with jitter, wrapped in the box."""
    rng = np.random.default_rng(seed)
    grid = np.stack(
        np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"), axis=-1
    ).reshape(-1, 3).astype(float)
    pos = grid * a + rng.uniform(-jitter, jitter, (grid.shape[0], 3))
    cell = np.eye(3) * (n_rep * a)
    return np.mod(pos, n_rep * a), cell


@pytest.mark.parametrize("pbc", [[True] * 3, [False] * 3, [True, False, True]])
def test_cell_list_matches_oracle(pbc):
    pos, cell = crystal(4, seed=1)
    cutoff = 4.5
    nm, num, sh = cell_list(jnp.asarray(pos), cutoff, jnp.asarray(cell), np.array(pbc))
    expected = brute_force_neighbors(pos, cutoff, cell, pbc)
    assert rows_from_matrix(nm, num, sh) == expected


def test_cell_list_triclinic():
    rng = np.random.default_rng(2)
    cell = np.array([[8.0, 0, 0], [1.5, 7.0, 0], [-1.0, 0.8, 9.0]])
    frac = rng.uniform(0, 1, (120, 3))
    pos = frac @ cell
    cutoff = 2.8
    nm, num, sh = cell_list(
        jnp.asarray(pos), cutoff, jnp.asarray(cell), np.array([True] * 3)
    )
    expected = brute_force_neighbors(pos, cutoff, cell, [True] * 3)
    assert rows_from_matrix(nm, num, sh) == expected


def test_cell_list_small_box_multi_image():
    # box smaller than cutoff: wrap count > 1 per dimension
    cell = np.eye(3) * 3.0
    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 3.0, (10, 3))
    cutoff = 4.0
    nm, num, sh = cell_list(
        jnp.asarray(pos), cutoff, jnp.asarray(cell), np.array([True] * 3),
        max_neighbors=512,
    )
    expected = brute_force_neighbors(pos, cutoff, cell, [True] * 3, extra_margin=2)
    assert rows_from_matrix(nm, num, sh) == expected


def test_cell_list_unwrapped_positions():
    # positions outside the box must wrap correctly via atom_periodic_shifts
    pos, cell = crystal(3, seed=4)
    pos = pos + np.array([7.0, -11.0, 23.0])  # shift whole system out of the box
    cutoff = 3.5
    nm, num, sh = cell_list(
        jnp.asarray(pos), cutoff, jnp.asarray(cell), np.array([True] * 3)
    )
    expected = brute_force_neighbors(pos, cutoff, cell, [True] * 3, extra_margin=10)
    assert rows_from_matrix(nm, num, sh) == expected


def test_cell_list_half_fill():
    pos, cell = crystal(4, seed=5)
    cutoff = 4.0
    nm, num, sh = cell_list(
        jnp.asarray(pos), cutoff, jnp.asarray(cell), np.array([True] * 3),
        half_fill=True,
    )
    expected = brute_force_neighbors(pos, cutoff, cell, [True] * 3)
    half = rows_from_matrix(nm, num, sh)
    assert mirror_half_rows(half) == expected
    assert 2 * sum(len(r) for r in half) == sum(len(r) for r in expected)


def test_build_query_split_and_rebuild_detection():
    pos, cell = crystal(4, seed=6)
    cutoff = 4.0
    max_cells, radius = estimate_cell_list_sizes(cell, [True] * 3, cutoff)
    cl = build_cell_list(jnp.asarray(pos), cutoff, jnp.asarray(cell), np.array([True] * 3), max_cells)

    # CSR artifacts are consistent
    counts = np.asarray(cl.atoms_per_cell_count)
    assert counts.sum() == pos.shape[0]
    order = np.asarray(cl.cell_atom_list)
    assert sorted(order.tolist()) == list(range(pos.shape[0]))

    radius_t = tuple(int(v) for v in np.asarray(radius))
    cap = int(np.ceil(counts.max() / 8)) * 8
    nm, num, sh = query_cell_list(
        jnp.asarray(pos), cutoff, jnp.asarray(cell), np.array([True] * 3),
        cl, radius_t, cap, 96, fill_value=pos.shape[0],
    )
    expected = brute_force_neighbors(pos, cutoff, cell, [True] * 3)
    assert rows_from_matrix(nm, num, sh) == expected

    # rebuild detection: unchanged positions -> no rebuild
    flag = cell_list_needs_rebuild(
        jnp.asarray(pos), cl.atom_to_cell_mapping, cl.cells_per_dimension,
        jnp.asarray(cell), np.array([True] * 3),
    )
    assert not bool(jax.device_get(flag)[0])
    # move one atom across a cell boundary -> rebuild
    moved = pos.copy()
    moved[0] += 5.0
    flag = cell_list_needs_rebuild(
        jnp.asarray(moved), cl.atom_to_cell_mapping, cl.cells_per_dimension,
        jnp.asarray(cell), np.array([True] * 3),
    )
    assert bool(jax.device_get(flag)[0])

    # skin-distance detector
    assert not bool(jax.device_get(neighbor_list_needs_rebuild(
        jnp.asarray(pos), jnp.asarray(pos + 0.01), 0.5))[0])
    assert bool(jax.device_get(neighbor_list_needs_rebuild(
        jnp.asarray(pos), jnp.asarray(moved), 0.5))[0])


def test_cell_list_agrees_with_naive():
    from nvalchemiops_tpu.neighborlist import naive_neighbor_list

    pos, cell = crystal(5, seed=7)
    cutoff = 3.2
    nm_c, num_c, sh_c = cell_list(
        jnp.asarray(pos), cutoff, jnp.asarray(cell), np.array([True] * 3)
    )
    nm_n, num_n, sh_n = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell)
    )
    assert rows_from_matrix(nm_c, num_c, sh_c) == rows_from_matrix(nm_n, num_n, sh_n)
