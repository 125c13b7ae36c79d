# SPDX-License-Identifier: Apache-2.0
"""Naive neighbor-list tests against the numpy brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.neighborlist import (
    NeighborOverflowError,
    assert_max_neighbors,
    get_neighbor_list_from_neighbor_matrix,
    naive_neighbor_list,
    naive_neighbor_list_dual_cutoff,
    neighbor_list,
)

from .oracle import brute_force_neighbors, mirror_half_rows, rows_from_matrix


def random_system(n, box, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, box, size=(n, 3))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64])
def test_naive_no_pbc_matches_oracle(dtype):
    pos = random_system(60, 6.0, seed=1)
    cutoff = 2.1
    nm, num = naive_neighbor_list(jnp.asarray(pos, dtype=dtype), cutoff)
    expected = brute_force_neighbors(pos, cutoff)
    got = rows_from_matrix(nm, num)
    assert got == expected
    assert np.array_equal(np.asarray(num), [len(r) for r in expected])


@pytest.mark.parametrize(
    "pbc", [[True, True, True], [True, False, True], [False, False, False]]
)
def test_naive_pbc_matches_oracle(pbc):
    rng = np.random.default_rng(2)
    cell = np.diag([5.0, 6.0, 7.0]) + rng.uniform(-0.4, 0.4, (3, 3))
    pos = rng.uniform(0, 1, size=(40, 3)) @ cell
    cutoff = 2.5
    out = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array(pbc), cell=jnp.asarray(cell)
    )
    if any(pbc):
        nm, num, sh = out
        got = rows_from_matrix(nm, num, sh)
    else:
        nm, num = out
        got = rows_from_matrix(nm, num)
    expected = brute_force_neighbors(pos, cutoff, cell, pbc)
    assert got == expected


def test_naive_multi_image_small_cell():
    # cutoff larger than the box: many periodic self-images
    cell = np.eye(3) * 2.0
    pos = np.array([[0.1, 0.2, 0.3], [1.1, 1.0, 0.9]])
    cutoff = 3.0
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell),
        max_neighbors=256,
    )
    expected = brute_force_neighbors(pos, cutoff, cell, [True] * 3)
    assert rows_from_matrix(nm, num, sh) == expected
    # self-images must be present
    assert any(e[0] == 0 for e in expected[0])


@pytest.mark.parametrize("periodic", [False, True])
def test_naive_half_fill(periodic):
    rng = np.random.default_rng(3)
    cell = np.eye(3) * 5.0
    pos = rng.uniform(0, 5.0, size=(30, 3))
    cutoff = 2.0
    kwargs = dict(half_fill=True)
    if periodic:
        out = naive_neighbor_list(
            jnp.asarray(pos), cutoff, pbc=np.array([True] * 3),
            cell=jnp.asarray(cell), **kwargs,
        )
        nm, num, sh = out
        half_rows = rows_from_matrix(nm, num, sh)
    else:
        nm, num = naive_neighbor_list(jnp.asarray(pos), cutoff, **kwargs)
        half_rows = rows_from_matrix(nm, num)
    expected = brute_force_neighbors(
        pos, cutoff, cell if periodic else None, [True] * 3 if periodic else None
    )
    # each pair stored exactly once; mirroring recovers the full set
    assert mirror_half_rows(half_rows) == expected
    total_half = sum(len(r) for r in half_rows)
    total_full = sum(len(r) for r in expected)
    assert 2 * total_half == total_full


def test_dual_cutoff_consistency():
    rng = np.random.default_rng(4)
    cell = np.eye(3) * 6.0
    pos = rng.uniform(0, 6.0, size=(40, 3))
    c1, c2 = 1.5, 3.0
    nm1, num1, sh1, nm2, num2, sh2 = naive_neighbor_list_dual_cutoff(
        jnp.asarray(pos), c1, c2, pbc=np.array([True] * 3), cell=jnp.asarray(cell)
    )
    assert rows_from_matrix(nm1, num1, sh1) == brute_force_neighbors(
        pos, c1, cell, [True] * 3
    )
    assert rows_from_matrix(nm2, num2, sh2) == brute_force_neighbors(
        pos, c2, cell, [True] * 3
    )


def test_coo_conversion_roundtrip():
    pos = random_system(25, 5.0, seed=5)
    cutoff = 2.0
    nm, num = naive_neighbor_list(jnp.asarray(pos), cutoff)
    nl, ptr = get_neighbor_list_from_neighbor_matrix(nm, num, fill_value=pos.shape[0])
    nl = np.asarray(nl)
    ptr = np.asarray(ptr)
    assert nl.shape[0] == 2
    assert ptr[-1] == nl.shape[1] == int(np.asarray(num).sum())
    # CSR rows consistent with matrix rows
    expected = brute_force_neighbors(pos, cutoff)
    for a in range(pos.shape[0]):
        js = set(nl[1, ptr[a]:ptr[a + 1]].tolist())
        assert js == {e[0] for e in expected[a]}


def test_overflow_detection():
    pos = random_system(30, 3.0, seed=6)
    cutoff = 2.5  # dense cluster, many neighbors
    nm, num = naive_neighbor_list(jnp.asarray(pos), cutoff, max_neighbors=4)
    assert int(np.asarray(num).max()) > 4  # counts are exact even on overflow
    with pytest.raises(NeighborOverflowError):
        assert_max_neighbors(nm, num)


def test_dispatcher_selects_and_matches():
    pos = random_system(50, 5.0, seed=7)
    cutoff = 1.8
    nm_a, num_a = neighbor_list(jnp.asarray(pos), cutoff)
    nm_b, num_b = naive_neighbor_list(jnp.asarray(pos), cutoff)
    assert rows_from_matrix(nm_a, num_a) == rows_from_matrix(nm_b, num_b)


def test_empty_system():
    nm, num = naive_neighbor_list(jnp.zeros((0, 3)), 2.0)
    assert nm.shape[0] == 0 and num.shape[0] == 0
