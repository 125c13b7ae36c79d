# SPDX-License-Identifier: Apache-2.0
"""f32/f64 dtype matrix over every subsystem (reference strategy §4.1).

The reference parametrizes every test class over [float32, float64]
(e.g. test/neighborlist/test_neighborlist.py:41-43).  This file runs one
representative scenario per subsystem under both dtypes and asserts
(a) the output dtype follows the input dtype, and (b) f32 agrees with
f64 to f32-roundoff-scale tolerances.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.interactions.dispersion import dftd3
from nvalchemiops_tpu.interactions.electrostatics import (
    coulomb_energy_forces,
    ewald_summation,
    estimate_ewald_parameters,
    pme_reciprocal_space,
)
from nvalchemiops_tpu.neighborlist import naive_neighbor_list
from nvalchemiops_tpu.spline import spline_gather, spline_spread

from tests.interactions.dispersion.test_dftd3 import element_tables

DTYPES = [jnp.float32, jnp.float64]


def _system(n=40, box=7.0, seed=2):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()
    numbers = rng.integers(1, 6, n)
    cell = np.eye(3) * box
    return pos, q, numbers, cell


@pytest.mark.parametrize("dtype", DTYPES)
def test_neighborlist_dtype_invariant_pairs(dtype):
    pos, _q, _z, cell = _system()
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos, dtype), 3.0, cell=jnp.asarray(cell, dtype),
        pbc=np.array([True] * 3))
    nm64, num64, _ = naive_neighbor_list(
        jnp.asarray(pos, jnp.float64), 3.0,
        cell=jnp.asarray(cell, jnp.float64), pbc=np.array([True] * 3))
    np.testing.assert_array_equal(np.asarray(num), np.asarray(num64))


@pytest.mark.parametrize("dtype", DTYPES)
def test_coulomb_dtype_follows_input(dtype):
    pos, q, _z, cell = _system()
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos, dtype), 3.0, cell=jnp.asarray(cell, dtype),
        pbc=np.array([True] * 3))
    e, f = coulomb_energy_forces(
        jnp.asarray(pos, dtype), jnp.asarray(q, dtype),
        jnp.asarray(cell, dtype), 3.0,
        neighbor_matrix=nm, neighbor_matrix_shifts=sh)
    assert e.dtype == dtype and f.dtype == dtype
    if dtype == jnp.float32:
        e64, f64 = coulomb_energy_forces(
            jnp.asarray(pos, jnp.float64), jnp.asarray(q, jnp.float64),
            jnp.asarray(cell, jnp.float64), 3.0,
            neighbor_matrix=nm, neighbor_matrix_shifts=sh)
        np.testing.assert_allclose(np.asarray(e), np.asarray(e64),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f64),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dtype", DTYPES)
def test_dftd3_f32_tracks_f64(dtype):
    pos, _q, numbers, cell = _system()
    params = element_tables()
    nm, _num, sh = naive_neighbor_list(
        jnp.asarray(pos, dtype), 3.2, cell=jnp.asarray(cell, dtype),
        pbc=np.array([True] * 3))
    e, f, cn = dftd3(
        jnp.asarray(pos, dtype), jnp.asarray(numbers, jnp.int32),
        0.4, 4.6, 1.7, d3_params=params, cell=jnp.asarray(cell, dtype),
        neighbor_matrix=nm, neighbor_matrix_shifts=sh, output_dtype=dtype)
    assert e.dtype == dtype and f.dtype == dtype
    assert np.isfinite(np.asarray(f)).all()
    if dtype == jnp.float32:
        e64, f64, _ = dftd3(
            jnp.asarray(pos, jnp.float64), jnp.asarray(numbers, jnp.int32),
            0.4, 4.6, 1.7, d3_params=params,
            cell=jnp.asarray(cell, jnp.float64),
            neighbor_matrix=nm, neighbor_matrix_shifts=sh,
            output_dtype=jnp.float64)
        np.testing.assert_allclose(float(jnp.sum(e)), float(jnp.sum(e64)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(f), np.asarray(f64),
                                   atol=1e-4)


@pytest.mark.parametrize("dtype", DTYPES)
def test_ewald_and_pme_dtype(dtype):
    pos, q, _z, cell = _system(n=24, box=5.0)
    params = estimate_ewald_parameters(
        jnp.asarray(pos, dtype), jnp.asarray(cell, dtype), accuracy=1e-6)
    alpha = float(params.alpha[0])
    cutoff = float(params.real_space_cutoff[0])
    nm, _num, sh = naive_neighbor_list(
        jnp.asarray(pos, dtype), cutoff, cell=jnp.asarray(cell, dtype),
        pbc=np.array([True] * 3), max_neighbors=512)
    e = ewald_summation(
        jnp.asarray(pos, dtype), jnp.asarray(q, dtype),
        jnp.asarray(cell, dtype), alpha=alpha,
        k_cutoff=float(params.reciprocal_space_cutoff[0]),
        neighbor_matrix=nm, neighbor_matrix_shifts=sh)
    assert e.dtype == dtype
    e_rec, f_rec = pme_reciprocal_space(
        jnp.asarray(pos, dtype), jnp.asarray(q, dtype),
        jnp.asarray(cell, dtype), alpha, mesh_dimensions=(16, 16, 16),
        compute_forces=True)
    assert e_rec.dtype == dtype and f_rec.dtype == dtype
    assert np.isfinite(np.asarray(f_rec)).all()


@pytest.mark.parametrize("dtype", DTYPES)
def test_spline_roundtrip_dtype(dtype):
    pos, q, _z, cell = _system(n=30, box=6.0)
    mesh = spline_spread(
        jnp.asarray(pos, dtype), jnp.asarray(q, dtype),
        jnp.asarray(cell, dtype), mesh_dims=(12, 12, 12), spline_order=4)
    assert mesh.dtype == dtype
    # charge conservation at any dtype
    np.testing.assert_allclose(float(jnp.sum(mesh)), float(np.sum(q)),
                               rtol=1e-5, atol=1e-5)
    vals = spline_gather(jnp.asarray(pos, dtype), mesh,
                         jnp.asarray(cell, dtype), spline_order=4)
    assert vals.dtype == dtype
