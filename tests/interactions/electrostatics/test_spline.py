# SPDX-License-Identifier: Apache-2.0
"""B-spline mesh tests: partition of unity, adjointness, gradients, channels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.spline import (
    bspline_derivative,
    bspline_weight,
    compute_bspline_deconvolution,
    spline_gather,
    spline_gather_channels,
    spline_gather_gradient,
    spline_gather_vec3,
    spline_spread,
    spline_spread_channels,
)


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_partition_of_unity(order):
    # sum over integer-shifted B-splines is 1 for any fractional position
    for theta in np.linspace(0, 0.999, 7):
        offs = np.arange(order) + np.floor(theta - (order - 2) / 2.0)
        u = order / 2.0 + theta - offs
        w = np.asarray(bspline_weight(jnp.asarray(u), order))
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
        assert (w >= -1e-14).all()


@pytest.mark.parametrize("order", [2, 3, 4])
def test_derivative_matches_finite_difference(order):
    u = jnp.linspace(0.05, order - 0.05, 57)
    h = 1e-6
    fd = (bspline_weight(u + h, order) - bspline_weight(u - h, order)) / (2 * h)
    # exclude points near the piecewise joints where FD straddles a break
    joints = np.arange(order + 1)
    far = np.all(np.abs(np.asarray(u)[:, None] - joints[None, :]) > 1e-3, axis=1)
    d = np.asarray(bspline_derivative(u, order))
    np.testing.assert_allclose(d[far], np.asarray(fd)[far], atol=1e-5)


def setup(seed=0, n=20, box=5.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, (n, 3))
    vals = rng.normal(size=n)
    cell = np.eye(3) * box
    return jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(cell)


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_spread_conserves_total(order):
    pos, vals, cell = setup(1)
    mesh = spline_spread(pos, vals, cell, (8, 10, 12), spline_order=order)
    np.testing.assert_allclose(float(mesh.sum()), float(vals.sum()), rtol=1e-12)


def test_spread_gather_adjoint():
    # <spread(v), m> == <v, gather(m)>
    pos, vals, cell = setup(2)
    rng = np.random.default_rng(3)
    mesh_dims = (8, 8, 8)
    m = jnp.asarray(rng.normal(size=mesh_dims))
    lhs = float(jnp.sum(spline_spread(pos, vals, cell, mesh_dims) * m))
    rhs = float(jnp.sum(vals * spline_gather(pos, m, cell)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_gather_gradient_matches_finite_difference():
    pos, q, cell = setup(4, n=8)
    rng = np.random.default_rng(5)
    mesh_dims = (12, 12, 12)
    # smooth mesh: superpose a few low-frequency plane waves
    x = np.stack(np.meshgrid(*[np.arange(d) / d for d in mesh_dims], indexing="ij"), -1)
    m = np.zeros(mesh_dims)
    for _ in range(3):
        kvec = rng.integers(-2, 3, 3)
        m += np.cos(2 * np.pi * (x @ kvec) + rng.uniform(0, 2 * np.pi))
    m = jnp.asarray(m)

    forces = spline_gather_gradient(pos, q, m, cell)

    # F = -q * d/dr [gather]; check via autodiff of the energy q*phi(r)
    def energy(p):
        return jnp.sum(q * spline_gather(p, m, cell))

    g = jax.grad(energy)(pos)
    np.testing.assert_allclose(np.asarray(forces), -np.asarray(g), atol=1e-9)


def test_gather_vec3_consistency():
    pos, q, cell = setup(6, n=10)
    rng = np.random.default_rng(7)
    mesh_dims = (8, 8, 8)
    vm = jnp.asarray(rng.normal(size=mesh_dims + (3,)))
    out = spline_gather_vec3(pos, q, vm, cell)
    # must equal componentwise scalar gathers x charge
    for c in range(3):
        ref = q * spline_gather(pos, vm[..., c], cell)
        np.testing.assert_allclose(np.asarray(out[:, c]), np.asarray(ref), rtol=1e-12)


def test_channels_roundtrip_consistency():
    pos, _, cell = setup(8, n=12)
    rng = np.random.default_rng(9)
    vals = jnp.asarray(rng.normal(size=(12, 5)))
    mesh_dims = (8, 8, 8)
    mesh = spline_spread_channels(pos, vals, cell, mesh_dims)
    assert mesh.shape == (5, 8, 8, 8)
    # channel c of the multi-channel spread equals a scalar spread
    for c in range(5):
        ref = spline_spread(pos, vals[:, c], cell, mesh_dims)
        np.testing.assert_allclose(np.asarray(mesh[c]), np.asarray(ref), rtol=1e-12)
    gathered = spline_gather_channels(pos, mesh, cell)
    assert gathered.shape == (12, 5)
    for c in range(5):
        ref = spline_gather(pos, mesh[c], cell)
        np.testing.assert_allclose(np.asarray(gathered[:, c]), np.asarray(ref), rtol=1e-12)


def test_batch_matches_per_system():
    rng = np.random.default_rng(10)
    cells = np.stack([np.eye(3) * 4.0, np.eye(3) * 6.0])
    sizes = [9, 13]
    pos = np.concatenate([rng.uniform(0, 4.0, (s, 3)) for s in sizes])
    vals = rng.normal(size=sum(sizes))
    batch_idx = jnp.asarray(np.repeat([0, 1], sizes).astype(np.int32))
    mesh_dims = (8, 8, 8)
    mesh_b = spline_spread(
        jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(cells), mesh_dims,
        batch_idx=batch_idx,
    )
    assert mesh_b.shape == (2, 8, 8, 8)
    off = 0
    for b, s in enumerate(sizes):
        ref = spline_spread(
            jnp.asarray(pos[off:off + s]), jnp.asarray(vals[off:off + s]),
            jnp.asarray(cells[b]), mesh_dims,
        )
        np.testing.assert_allclose(np.asarray(mesh_b[b]), np.asarray(ref), rtol=1e-12)
        off += s
    # batched gather
    out_b = spline_gather(
        jnp.asarray(pos), mesh_b, jnp.asarray(cells), batch_idx=batch_idx
    )
    off = 0
    for b, s in enumerate(sizes):
        ref = spline_gather(jnp.asarray(pos[off:off + s]), mesh_b[b], jnp.asarray(cells[b]))
        np.testing.assert_allclose(np.asarray(out_b[off:off + s]), np.asarray(ref), rtol=1e-12)
        off += s


def test_triclinic_gradient():
    rng = np.random.default_rng(11)
    cell = jnp.asarray([[5.0, 0, 0], [1.0, 4.5, 0], [-0.5, 0.3, 6.0]])
    pos = jnp.asarray(rng.uniform(0, 1, (6, 3)) @ np.asarray(cell))
    q = jnp.asarray(rng.normal(size=6))
    m = jnp.asarray(rng.normal(size=(8, 8, 8)))

    forces = spline_gather_gradient(pos, q, m, cell)
    g = jax.grad(lambda p: jnp.sum(q * spline_gather(p, m, cell)))(pos)
    np.testing.assert_allclose(np.asarray(forces), -np.asarray(g), atol=1e-9)


def test_deconvolution_basic():
    d = compute_bspline_deconvolution((8, 8, 8), spline_order=4)
    assert d.shape == (8, 8, 8)
    assert float(d[0, 0, 0]) == pytest.approx(1.0)
    assert (np.asarray(d) >= 1.0 - 1e-12).all()  # |b(k)|^2 <= 1


@pytest.mark.parametrize("order", [1, 2, 3, 4])
def test_stencil_helper_partition_of_unity(order):
    """The public low-level helpers reproduce a full normalized stencil
    (reference: spline.py:257-494 device functions)."""
    from nvalchemiops_tpu.spline import (
        bspline_grid_offset,
        bspline_weight_3d,
        bspline_weight_gradient_3d,
        compute_fractional_coords,
        wrap_grid_index,
    )

    rng = np.random.default_rng(11)
    cell = jnp.asarray(np.diag([5.0, 6.0, 7.0]))
    pos = jnp.asarray(rng.uniform(0, 5, (11, 3)))
    mesh_dims = (16, 20, 24)
    base, theta = compute_fractional_coords(pos, cell, mesh_dims)
    assert base.dtype == jnp.int32
    assert np.all((np.asarray(theta) >= 0) & (np.asarray(theta) < 1))

    pts = jnp.arange(order**3)[:, None] * jnp.ones((11,), jnp.int32)
    offs = bspline_grid_offset(pts, order, theta[None])
    w = bspline_weight_3d(theta[None], offs, order)          # [order^3, N]
    np.testing.assert_allclose(np.asarray(w.sum(0)), 1.0, atol=1e-12)
    g = bspline_weight_gradient_3d(theta[None], offs, order, mesh_dims)
    np.testing.assert_allclose(np.asarray(g.sum(0)), 0.0, atol=1e-10)

    # periodic wrap of the absolute grid indices
    absolute = base[None] + offs
    wrapped = wrap_grid_index(absolute, jnp.asarray(mesh_dims))
    arr = np.asarray(wrapped)
    assert arr.min() >= 0
    assert np.all(arr < np.asarray(mesh_dims))
    np.testing.assert_array_equal(np.asarray(wrap_grid_index(-3, 16)), 13)
