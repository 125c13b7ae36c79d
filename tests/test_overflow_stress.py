# SPDX-License-Identifier: Apache-2.0
"""Capacity-overflow stress tests on deliberately clustered systems.

The library's fixed-capacity structures (atom grid slots, PME mesh tiles,
neighbor matrices) all follow the reference's estimate-then-check split
(reference cell_list.py:639-724, neighbor_utils.py:343-359): a host-side
estimate sizes the static buffers, the build reports the observed
occupancy, and callers rebuild (or raise) when the estimate was wrong.
These tests drive each structure past its estimate with far-from-Poisson
clustered systems and assert (a) overflow is *detected* (never silently
dropped) and (b) the auto paths end in a consistent, nothing-lost state.

Round-2 VERDICT item #10.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu import spline_windowed as sw
from nvalchemiops_tpu.grid import (
    build_atom_grid,
    build_atom_grid_auto,
    estimate_grid_geometry,
)
from nvalchemiops_tpu.neighborlist import naive_neighbor_list
from nvalchemiops_tpu.neighborlist.neighbor_utils import (
    NeighborOverflowError,
    assert_max_neighbors,
)


def _clustered_box(n=20_000, box=60.0, frac=0.5, sigma=1.5, seed=0):
    """Half the atoms uniform, half in a tight Gaussian blob (periodic)."""
    rng = np.random.default_rng(seed)
    n_blob = int(n * frac)
    uni = rng.uniform(0, box, (n - n_blob, 3))
    blob = rng.normal(box / 2, sigma, (n_blob, 3)) % box
    pos = np.concatenate([uni, blob]).astype(np.float32)
    return pos, np.eye(3, dtype=np.float32) * box


def test_grid_overflow_detected_then_rebuilt():
    """Poisson-safe cap underestimates a clustered system; the build must
    report the true occupancy (counts_max) and the auto path must end with
    every atom in a real slot."""
    pos, cell = _clustered_box()
    pbc = np.array([True] * 3)
    cutoff = 6.0
    n = len(pos)

    dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n)
    g_small = build_atom_grid(jnp.asarray(pos), jnp.asarray(cell), pbc,
                              dims, radius, cap)
    true_occ = int(g_small.counts_max)
    # the blob must actually overflow the density-based estimate
    assert true_occ > cap, (true_occ, cap)
    # overflow is visible, not silent: ranks beyond cap land in the trash
    # slot, and counts_max reports the real maximum for the check step
    ncells = int(np.prod(g_small.dims))
    trash = int(jnp.sum(g_small.flat_slot >= ncells * g_small.cap))
    assert trash > 0

    # estimate-then-check: auto must deliver a grid with nothing dropped
    g = build_atom_grid_auto(jnp.asarray(pos), jnp.asarray(cell), pbc, cutoff)
    assert int(g.counts_max) <= g.cap
    ncells = int(np.prod(g.dims))
    assert int(jnp.sum(g.flat_slot < ncells * g.cap)) == n


def test_mesh_tile_overflow_detected_and_spread_charge_conserved():
    """observed_tile_capacity on a clustered crystal; the windowed spread
    must conserve total charge (the invariant silent atom-dropping breaks)
    even when the Poisson estimate would have overflowed."""
    pos, cell = _clustered_box(n=8_000, box=32.0, sigma=1.0, seed=3)
    mesh_dims = (32, 32, 32)
    q = np.random.default_rng(5).normal(size=len(pos)).astype(np.float32)

    cap_est = sw.mesh_tile_capacity(len(pos), mesh_dims)
    cap_obs = sw.observed_tile_capacity(jnp.asarray(pos), jnp.asarray(cell),
                                        mesh_dims)
    # the blob pushes the observed occupancy past the density estimate
    assert cap_obs > cap_est, (cap_obs, cap_est)

    tiles = sw.build_mesh_tiles(jnp.asarray(pos), jnp.asarray(cell),
                                mesh_dims, order=4, cap=cap_obs)
    assert int(tiles.counts_max) <= cap_obs
    mesh = sw.windowed_spread(tiles, jnp.asarray(q))
    # B-spline partition of unity: sum over the mesh == total charge;
    # a dropped atom shifts the sum by its charge
    np.testing.assert_allclose(float(jnp.sum(mesh)), float(np.sum(q)),
                               rtol=1e-4)

    # undersized tiles must be *detectable* for the public path's
    # estimate-then-check / dense-fallback logic
    tiles_small = sw.build_mesh_tiles(jnp.asarray(pos), jnp.asarray(cell),
                                      mesh_dims, order=4, cap=cap_est)
    assert int(tiles_small.counts_max) > cap_est


def test_neighbor_matrix_overflow_raises_at_scale():
    """assert_max_neighbors raises NeighborOverflowError when the padded
    matrix was too small for a dense cluster (reference
    neighbor_utils.py:343-359 contract)."""
    pos, cell = _clustered_box(n=4_000, box=40.0, sigma=1.0, seed=7)
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), 5.0, cell=jnp.asarray(cell),
        pbc=np.array([True] * 3), max_neighbors=32)
    assert int(jnp.max(num)) > 32  # the cluster really overflows
    with pytest.raises(NeighborOverflowError):
        assert_max_neighbors(nm, num)
    # a correctly sized rebuild passes the check
    max_nb = int(jnp.max(num))
    cap = int(np.ceil((max_nb + 1) / 16)) * 16
    nm2, num2, sh2 = naive_neighbor_list(
        jnp.asarray(pos), 5.0, cell=jnp.asarray(cell),
        pbc=np.array([True] * 3), max_neighbors=cap)
    assert_max_neighbors(nm2, num2)
    assert int(jnp.max(num2)) == max_nb
