# SPDX-License-Identifier: Apache-2.0
"""Dense minimum-image Coulomb vs the grid engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.grid import (
    build_atom_grid,
    estimate_grid_geometry,
    grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.electrostatics.dense import (
    batch_dense_coulomb_energy_forces,
    dense_coulomb_energy_forces,
)


@pytest.mark.parametrize("alpha", [0.0, 0.35])
def test_dense_coulomb_matches_grid(alpha):
    rng = np.random.default_rng(0)
    npa, box, cutoff = 250, 14.0, 4.0
    pos = jnp.asarray(rng.uniform(0, box, (npa, 3)), jnp.float32)
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    q = jnp.asarray(rng.normal(size=npa), jnp.float32)
    pbc = np.array([True] * 3)

    e_d, f_d = dense_coulomb_energy_forces(pos, q, cell, cutoff, alpha)
    dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, npa,
                                               target_occupancy=0.4)
    g = build_atom_grid(pos, cell, pbc, dims, radius, cap)
    e_g, f_g = grid_coulomb_energy_forces(g, q, cutoff, alpha)
    np.testing.assert_allclose(np.asarray(e_d), np.asarray(e_g), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f_d), np.asarray(f_g), atol=2e-5)


def test_batch_dense_coulomb_matches_per_system():
    rng = np.random.default_rng(1)
    B, npa, box, cutoff = 4, 120, 12.0, 4.0
    pos = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)

    e_b, f_b = batch_dense_coulomb_energy_forces(pos, q, cell, cutoff, 0.3)
    for b in range(B):
        e1, f1 = dense_coulomb_energy_forces(pos[b], q[b], cell, cutoff, 0.3)
        np.testing.assert_allclose(np.asarray(e_b[b]), np.asarray(e1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(f_b[b]), np.asarray(f1),
                                   atol=1e-6)
