# SPDX-License-Identifier: Apache-2.0
"""Energy gradients with respect to the cell, validated by finite differences.

The reference asserts cell gradients against torchpme
(test/interactions/electrostatics/test_pme.py:536-797); torchpme is not an
oracle here, so the check is the definitional one: ``jax.grad(E, cell)``
must equal central finite differences of the same traced function (f64, CPU
backend).  This guards against host-side constant-folding of cell-dependent
values (Miller ranges, mesh geometry, tile setup) silently producing wrong
gradients.

Neighbor structures and Miller ranges are static (resolved at the
unperturbed cell); the FD step is small enough not to change either.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.neighborlist import naive_neighbor_list
from nvalchemiops_tpu.interactions.electrostatics import (
    coulomb_energy,
    ewald_real_space,
    ewald_reciprocal_space,
    generate_k_vectors_ewald_summation,
    pme_reciprocal_space,
)
from nvalchemiops_tpu.interactions.electrostatics.k_vectors import (
    _miller_ranges,
)

DTYPE = jnp.float64


def _crystal(seed=0, n=12, a=4.5):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, a, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()
    # slightly triclinic cell so off-diagonal gradients are non-trivial
    cell = np.eye(3) * a
    cell[0, 1] = 0.3
    cell[1, 2] = -0.2
    return pos, q, cell


def _fd_cell_grad(energy_fn, cell, h=1e-6):
    g = np.zeros((3, 3))
    for r in range(3):
        for c in range(3):
            dp = np.zeros((3, 3))
            dp[r, c] = h
            g[r, c] = (
                float(energy_fn(jnp.asarray(cell + dp, DTYPE)))
                - float(energy_fn(jnp.asarray(cell - dp, DTYPE)))
            ) / (2 * h)
    return g


def _check(energy_fn, cell, rtol=1e-6, atol=1e-8):
    g_ad = np.asarray(jax.grad(energy_fn)(jnp.asarray(cell, DTYPE)))
    g_fd = _fd_cell_grad(energy_fn, cell)
    assert np.abs(g_ad).max() > 1e-6, "cell gradient vanished — trace broken?"
    np.testing.assert_allclose(g_ad, g_fd, rtol=rtol, atol=atol)


def test_coulomb_real_space_cell_grad():
    pos, q, cell = _crystal(seed=1)
    cutoff = 3.5
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos, DTYPE), cutoff + 0.5, pbc=np.array([True] * 3),
        cell=jnp.asarray(cell, DTYPE), max_neighbors=96,
    )

    def energy(c):
        return coulomb_energy(
            jnp.asarray(pos, DTYPE), jnp.asarray(q, DTYPE), c, cutoff,
            alpha=0.7, neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        ).sum()

    _check(energy, cell)


def test_ewald_reciprocal_cell_grad():
    pos, q, cell = _crystal(seed=2)
    alpha, k_cutoff = 0.9, 9.0
    max_hkl = _miller_ranges(jnp.asarray(cell, DTYPE).reshape(1, 3, 3), k_cutoff)

    def energy(c):
        kv = generate_k_vectors_ewald_summation(c, k_cutoff, max_hkl=max_hkl)
        return ewald_reciprocal_space(
            jnp.asarray(pos, DTYPE), jnp.asarray(q, DTYPE), c, kv, alpha
        ).sum()

    _check(energy, cell)


def test_ewald_full_summation_cell_grad():
    pos, q, cell = _crystal(seed=3)
    alpha, k_cutoff, cutoff = 0.9, 11.0, 3.8
    max_hkl = _miller_ranges(jnp.asarray(cell, DTYPE).reshape(1, 3, 3), k_cutoff)
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos, DTYPE), cutoff + 0.5, pbc=np.array([True] * 3),
        cell=jnp.asarray(cell, DTYPE), max_neighbors=128,
    )

    def energy(c):
        kv = generate_k_vectors_ewald_summation(c, k_cutoff, max_hkl=max_hkl)
        e_r = ewald_real_space(
            jnp.asarray(pos, DTYPE), jnp.asarray(q, DTYPE), c, alpha,
            neighbor_matrix=nm, neighbor_matrix_shifts=sh, cutoff=cutoff,
        )
        e_k = ewald_reciprocal_space(
            jnp.asarray(pos, DTYPE), jnp.asarray(q, DTYPE), c, kv, alpha
        )
        return (e_r + e_k).sum()

    _check(energy, cell)


def test_ewald_k_vectors_reject_traced_cell_without_ranges():
    pos, q, cell = _crystal(seed=3)

    def energy(c):
        kv = generate_k_vectors_ewald_summation(c, 9.0)
        return jnp.sum(kv)

    with pytest.raises(ValueError, match="max_hkl"):
        jax.grad(energy)(jnp.asarray(cell, DTYPE))


@pytest.mark.parametrize("tile_windowed", [False, True])
def test_pme_reciprocal_cell_grad(tile_windowed):
    pos, q, cell = _crystal(seed=4)
    mesh = (16, 16, 16)
    kwargs = {}
    if tile_windowed:
        from nvalchemiops_tpu.spline_windowed import observed_tile_capacity

        kwargs["tile_capacity"] = observed_tile_capacity(
            jnp.asarray(pos, DTYPE), jnp.asarray(cell, DTYPE), mesh
        )

    def energy(c):
        return pme_reciprocal_space(
            jnp.asarray(pos, DTYPE), jnp.asarray(q, DTYPE), c, 0.9,
            mesh_dimensions=mesh, spline_order=4, **kwargs,
        ).sum()

    # FD across a mesh/tile boundary is noisier; spline spread is C^2
    _check(energy, cell, rtol=5e-6, atol=1e-7)


def test_dftd3_cell_grad():
    from nvalchemiops_tpu.interactions.dispersion import dftd3
    from nvalchemiops_tpu.interactions.dispersion.d3_data import (
        realistic_test_tables,
    )

    pos, _, cell = _crystal(seed=5, n=10, a=7.0)
    rng = np.random.default_rng(5)
    numbers = jnp.asarray(rng.choice([1, 6, 7, 8], size=10).astype(np.int32))
    tables = realistic_test_tables(np.float64)
    cutoff = 6.0
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos, DTYPE), cutoff + 1.0, pbc=np.array([True] * 3),
        cell=jnp.asarray(cell, DTYPE), max_neighbors=96,
    )

    def energy(c):
        e, f, cn = dftd3(
            jnp.asarray(pos, DTYPE), numbers, 0.4289, 4.4407, 0.7875,
            d3_params={k: jnp.asarray(v) for k, v in tables.items()},
            cell=c, neighbor_matrix=nm, neighbor_matrix_shifts=sh,
            output_dtype=None,
        )
        return jnp.sum(e)

    _check(energy, cell, rtol=5e-6, atol=1e-9)
