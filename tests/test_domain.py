# SPDX-License-Identifier: Apache-2.0
"""Domain-decomposition (z-slab shard_map) sweeps vs the single-device grid."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.grid import (
    build_atom_grid,
    estimate_grid_geometry,
    grid_coulomb_energy_forces,
    grid_coordination_numbers,
)
from nvalchemiops_tpu.parallel.domain import (
    make_z_mesh,
    domain_coulomb_energy_forces,
    domain_dftd3_cn,
)


def _system(n=800, box=32.0, seed=3):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, (n, 3))
    q = rng.normal(size=n).astype(np.float32)
    cell = np.eye(3) * box
    return pos, q, cell


def _grid(pos, cell, pbc, cutoff, n):
    # 32 A box with 4 A bins -> 8 cells per dim, radius 1: one-cell-thick
    # slabs across the 8-device mesh
    dims, radius, cap = estimate_grid_geometry(
        cell, pbc, cutoff, n, target_occupancy=0.4
    )
    g = build_atom_grid(jnp.asarray(pos, jnp.float32),
                        jnp.asarray(cell, jnp.float32), pbc, dims, radius, cap)
    assert int(g.counts_max) <= cap
    return g


@pytest.fixture(scope="module")
def zmesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return make_z_mesh()


@pytest.mark.parametrize("alpha", [0.0, 0.35])
def test_domain_coulomb_matches_single_device(zmesh, alpha):
    pos, q, cell = _system()
    pbc = np.array([True] * 3)
    cutoff = 4.0
    g = _grid(pos, cell, pbc, cutoff, len(pos))
    assert g.dims[0] % zmesh.devices.size == 0
    e_ref, f_ref = grid_coulomb_energy_forces(g, jnp.asarray(q), cutoff, alpha)
    e, f = domain_coulomb_energy_forces(zmesh, g, jnp.asarray(q),
                                        jnp.asarray(cell, jnp.float32),
                                        cutoff, alpha)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=2e-5)


def test_domain_cn_matches_single_device(zmesh):
    pos, q, cell = _system(seed=5)
    pbc = np.array([True] * 3)
    cutoff = 4.0
    n = len(pos)
    g = _grid(pos, cell, pbc, cutoff, n)
    rng = np.random.default_rng(0)
    rcov = jnp.asarray(rng.uniform(0.6, 1.4, n), jnp.float32)
    cn_ref = grid_coordination_numbers(g, rcov, cutoff)
    cn = domain_dftd3_cn(zmesh, g, rcov, jnp.asarray(cell, jnp.float32),
                         cutoff)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_ref),
                               rtol=1e-5, atol=1e-6)


def test_domain_dftd3_matches_single_device(zmesh):
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3
    from nvalchemiops_tpu.parallel.domain import domain_dftd3

    pos, _, cell = _system(seed=7)
    pbc = np.array([True] * 3)
    cutoff = 4.0
    n = len(pos)
    g = _grid(pos, cell, pbc, cutoff, n)

    rng = np.random.default_rng(1)
    zmax = 4
    numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
    rcov = jnp.asarray(np.r_[0.0, rng.uniform(0.6, 1.4, zmax)], jnp.float32)
    r4r2 = jnp.asarray(np.r_[0.0, rng.uniform(2.0, 6.0, zmax)], jnp.float32)
    cna = jnp.asarray(
        np.vstack([np.zeros(5),
                   np.cumsum(rng.uniform(0.3, 1.0, (zmax, 5)), 1)]),
        jnp.float32)
    c6_np = rng.uniform(5.0, 40.0, (zmax + 1, zmax + 1, 5, 5))
    c6_np[0] = 0.0
    c6_np[:, 0] = 0.0
    c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
    c6 = jnp.asarray(c6_np, jnp.float32)

    e_ref, f_ref, cn_ref = grid_dftd3(g, numbers, rcov, r4r2, c6, cna,
                                      cutoff, 0.42, 4.1, 1.7, engine="xla")
    e, f, cn = domain_dftd3(zmesh, g, numbers, rcov, r4r2, c6, cna,
                            cutoff, 0.42, 4.1, 1.7,
                            jnp.asarray(cell, jnp.float32))
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=2e-5)


def test_domain_pme_matches_single_device(zmesh):
    from nvalchemiops_tpu.interactions.electrostatics import (
        pme_reciprocal_space,
    )
    from nvalchemiops_tpu.parallel.domain import domain_pme_reciprocal

    rng = np.random.default_rng(11)
    n, box = 600, 24.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    mesh_dims = (32, 32, 32)
    alpha = 0.4

    e_ref, f_ref = pme_reciprocal_space(pos, q, cell, alpha,
                                        mesh_dimensions=mesh_dims,
                                        compute_forces=True)
    e, f = domain_pme_reciprocal(zmesh, pos, q, cell, alpha, mesh_dims,
                                 compute_forces=True)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                               atol=2e-5)


@pytest.mark.parametrize("pbc_tuple", [(True, True, False),   # non-periodic z
                                       (False, True, True),   # non-periodic x
                                       (False, False, False)])
def test_domain_coulomb_mixed_pbc(zmesh, pbc_tuple):
    """Masked ring edge / parked yx pads == single-device mixed-pbc sweep.

    pbc is (x, y, z) (grid.py convention): (True, True, False) exercises
    the non-periodic *z* ring-edge masking; (False, True, True) the local
    non-periodic-x pads.
    """
    pos, q, cell = _system(seed=17)
    pbc = np.array(pbc_tuple)
    cutoff = 4.0
    g = _grid(pos, cell, pbc, cutoff, len(pos))
    assert g.dims[0] % zmesh.devices.size == 0
    e_ref, f_ref = grid_coulomb_energy_forces(g, jnp.asarray(q), cutoff, 0.35)
    e, f = domain_coulomb_energy_forces(zmesh, g, jnp.asarray(q),
                                        jnp.asarray(cell, jnp.float32),
                                        cutoff, 0.35, pbc=pbc_tuple)
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=2e-5)


@pytest.mark.parametrize("pbc_tuple", [(True, True, False),   # non-periodic z
                                       (False, True, True)])  # non-periodic x
def test_domain_dftd3_mixed_pbc(zmesh, pbc_tuple):
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3
    from nvalchemiops_tpu.parallel.domain import domain_dftd3

    pos, _, cell = _system(seed=19)
    pbc = np.array(pbc_tuple)
    cutoff = 4.0
    n = len(pos)
    g = _grid(pos, cell, pbc, cutoff, n)

    rng = np.random.default_rng(2)
    zmax = 4
    numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
    rcov = jnp.asarray(np.r_[0.0, rng.uniform(0.6, 1.4, zmax)], jnp.float32)
    r4r2 = jnp.asarray(np.r_[0.0, rng.uniform(2.0, 6.0, zmax)], jnp.float32)
    cna = jnp.asarray(
        np.vstack([np.zeros(5),
                   np.cumsum(rng.uniform(0.3, 1.0, (zmax, 5)), 1)]),
        jnp.float32)
    c6_np = rng.uniform(5.0, 40.0, (zmax + 1, zmax + 1, 5, 5))
    c6_np[0] = 0.0
    c6_np[:, 0] = 0.0
    c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
    c6 = jnp.asarray(c6_np, jnp.float32)

    e_ref, f_ref, cn_ref = grid_dftd3(g, numbers, rcov, r4r2, c6, cna,
                                      cutoff, 0.42, 4.1, 1.7, engine="xla")
    e, f, cn = domain_dftd3(zmesh, g, numbers, rcov, r4r2, c6, cna,
                            cutoff, 0.42, 4.1, 1.7,
                            jnp.asarray(cell, jnp.float32), pbc=pbc_tuple)
    np.testing.assert_allclose(np.asarray(cn), np.asarray(cn_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=2e-5)


def test_domain_rejects_bad_slabs(zmesh):
    pos, q, cell = _system(n=100, box=9.0)
    pbc = np.array([True] * 3)
    dims, radius, cap = estimate_grid_geometry(cell, pbc, 3.0, 100,
                                               target_occupancy=0.4)
    g = build_atom_grid(jnp.asarray(pos, jnp.float32),
                        jnp.asarray(cell, jnp.float32), pbc, dims, radius, cap)
    if g.dims[0] % zmesh.devices.size == 0 and \
            g.dims[0] // zmesh.devices.size >= g.radius[0]:
        pytest.skip("grid happens to divide evenly")
    with pytest.raises(ValueError):
        domain_coulomb_energy_forces(zmesh, g, jnp.asarray(q),
                                     jnp.asarray(cell, jnp.float32), 3.0)


@pytest.mark.parametrize("pbc_tuple", [(True, True, True),
                                       (True, True, False)])  # non-periodic z
def test_domain_dftd3_coulomb_matches_separate(zmesh, pbc_tuple):
    """Fused domain D3+Coulomb == domain_dftd3 + domain Coulomb."""
    from nvalchemiops_tpu.parallel.domain import (
        domain_coulomb_energy_forces,
        domain_dftd3,
        domain_dftd3_coulomb,
    )

    pos, _, cell = _system(seed=13)
    pbc = np.array(pbc_tuple)
    cutoff = 4.0
    n = len(pos)
    g = _grid(pos, cell, pbc, cutoff, n)

    rng = np.random.default_rng(3)
    zmax = 4
    numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    rcov = jnp.asarray(np.r_[0.0, rng.uniform(0.6, 1.4, zmax)], jnp.float32)
    r4r2 = jnp.asarray(np.r_[0.0, rng.uniform(2.0, 6.0, zmax)], jnp.float32)
    cna = jnp.asarray(
        np.vstack([np.zeros(5),
                   np.cumsum(rng.uniform(0.3, 1.0, (zmax, 5)), 1)]),
        jnp.float32)
    c6_np = rng.uniform(5.0, 40.0, (zmax + 1, zmax + 1, 5, 5))
    c6_np[0] = 0.0
    c6_np[:, 0] = 0.0
    c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
    c6 = jnp.asarray(c6_np, jnp.float32)
    cellj = jnp.asarray(cell, jnp.float32)

    e_f, f_f, cn_f, ec_f, fc_f = domain_dftd3_coulomb(
        zmesh, g, numbers, q, rcov, r4r2, c6, cna,
        cutoff, 0.42, 4.1, 1.7, cellj, alpha=0.4, pbc=pbc_tuple)
    e_s, f_s, cn_s = domain_dftd3(zmesh, g, numbers, rcov, r4r2, c6, cna,
                                  cutoff, 0.42, 4.1, 1.7, cellj,
                                  pbc=pbc_tuple)
    ec_s, fc_s = domain_coulomb_energy_forces(zmesh, g, q, cellj,
                                              cutoff, 0.4, pbc=pbc_tuple)
    np.testing.assert_allclose(float(e_f), float(e_s), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cn_f), np.asarray(cn_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ec_f), np.asarray(ec_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fc_f), np.asarray(fc_s), atol=1e-5)
