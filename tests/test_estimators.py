# SPDX-License-Identifier: Apache-2.0
"""Host-side estimator helpers: bounds must be safe and exactly shaped.

Covers the three size/geometry estimators with no other direct tests:
``estimate_max_neighbors`` (reference neighbor_utils.py:296-340 heuristic),
``mesh_spacing_to_dimensions`` (reference parameters.py:379-437), and
``observed_tile_capacity`` (spline_windowed at-scale helper).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.neighborlist import (
    estimate_max_neighbors,
    naive_neighbor_list,
)
from nvalchemiops_tpu.interactions.electrostatics import (
    mesh_spacing_to_dimensions,
)
from nvalchemiops_tpu.spline_windowed import (
    build_mesh_tiles,
    observed_tile_capacity,
)


class TestEstimateMaxNeighbors:
    def test_nonpositive_cutoff_is_zero(self):
        assert estimate_max_neighbors(0.0) == 0
        assert estimate_max_neighbors(-1.0) == 0

    def test_multiple_of_16_and_monotone(self):
        prev = 0
        for cutoff in (0.5, 1.0, 2.0, 4.0, 8.0):
            est = estimate_max_neighbors(cutoff)
            assert est % 16 == 0 and est >= 16
            assert est >= prev
            prev = est

    def test_bounds_dense_cluster(self):
        # 4x4x4 unit-spaced cluster, cutoff 2.5: the heuristic (written for
        # ~liquid densities with a 5x safety factor) must bound the true
        # max neighbor count.
        rng = np.random.default_rng(0)
        pts = np.stack(np.meshgrid(*([np.arange(4.0)] * 3), indexing="ij"),
                       -1).reshape(-1, 3)
        pos = jnp.asarray(pts + rng.uniform(-0.05, 0.05, pts.shape),
                          jnp.float64)
        cutoff = 2.5
        _, num_neighbors = naive_neighbor_list(pos, cutoff)
        true_max = int(np.max(np.asarray(num_neighbors)))
        assert true_max > 0
        assert estimate_max_neighbors(cutoff) >= true_max


class TestMeshSpacingToDimensions:
    def test_power_of_two_and_covers_spacing(self):
        cell = jnp.asarray(np.diag([10.0, 20.0, 37.0]), jnp.float64)
        dims = mesh_spacing_to_dimensions(cell, 0.5)
        assert len(dims) == 3
        for d, length in zip(dims, (10.0, 20.0, 37.0)):
            assert d & (d - 1) == 0  # power of two
            assert length / d <= 0.5  # achieved spacing at least as fine
            assert d / 2 < np.ceil(length / 0.5) <= d  # tightest such power

    def test_batched_cells_take_the_max(self):
        cells = jnp.asarray(
            np.stack([np.eye(3) * 12.0, np.eye(3) * 24.0]), jnp.float64
        )
        dims = mesh_spacing_to_dimensions(cells, 1.0)
        big = mesh_spacing_to_dimensions(jnp.asarray(np.eye(3) * 24.0), 1.0)
        assert dims == big  # batch result covers the largest system
        # per-system spacing: doubled box at doubled spacing == small box
        per_sys = mesh_spacing_to_dimensions(cells, jnp.asarray([1.0, 2.0]))
        small = mesh_spacing_to_dimensions(jnp.asarray(np.eye(3) * 12.0), 1.0)
        assert per_sys == small

    def test_bad_spacing_shape_raises(self):
        cells = jnp.asarray(np.stack([np.eye(3)] * 2), jnp.float64)
        with pytest.raises(ValueError):
            mesh_spacing_to_dimensions(cells, jnp.asarray([1.0, 1.0, 1.0]))


class TestObservedTileCapacity:
    @pytest.mark.parametrize("dims", [(16, 16, 16), (8, 16, 24)])
    def test_capacity_admits_every_atom(self, dims):
        rng = np.random.default_rng(7)
        cell = jnp.asarray(np.diag(rng.uniform(9, 15, 3)), jnp.float64)
        pos = jnp.asarray(rng.uniform(-4, 18, (257, 3)), jnp.float64)
        cap = observed_tile_capacity(pos, cell, dims)
        assert cap % 8 == 0 and cap >= 8
        # building tiles at the observed capacity must not overflow
        tiles = build_mesh_tiles(pos, cell, dims, 4, cap)
        assert int(np.asarray(tiles.counts_max)) <= cap

    def test_crystal_capacity_tighter_than_poisson(self):
        # 512 atoms / 8 tiles = 64 per tile exactly; the observed capacity
        # should sit just above 64 (the Poisson-safe estimate for mean 64
        # adds ~5 sigma = 40 more slots — the docstring's raison d'etre).
        pts = np.stack(np.meshgrid(*([np.arange(8.0)] * 3), indexing="ij"),
                       -1).reshape(-1, 3) + 0.5
        cell = jnp.asarray(np.eye(3) * 8.0, jnp.float64)
        cap = observed_tile_capacity(jnp.asarray(pts), cell, (16, 16, 16))
        assert 64 < cap <= 80
