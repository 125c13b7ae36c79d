# SPDX-License-Identifier: Apache-2.0
"""Pallas kernel correctness in interpreter mode (CPU backend)."""

import numpy as np
import jax.numpy as jnp

from nvalchemiops_tpu.pallas.spread import (
    pallas_separable_gather,
    pallas_separable_spread,
)
from nvalchemiops_tpu.spline import _separable_gather, _separable_spread


def test_pallas_spread_matches_xla():
    rng = np.random.default_rng(0)
    n, nx, ny, nz = 130, 16, 8, 16
    qsx = jnp.asarray(rng.normal(size=(n, nx)), jnp.float32)
    sy = jnp.asarray(rng.normal(size=(n, ny)), jnp.float32)
    sz = jnp.asarray(rng.normal(size=(n, nz)), jnp.float32)
    m_p = pallas_separable_spread(qsx, sy, sz, interpret=True)
    m_x = _separable_spread(jnp.ones(n, jnp.float32), qsx, sy, sz)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x), atol=1e-4)


def test_pallas_gather_matches_xla():
    rng = np.random.default_rng(1)
    n, nx, ny, nz = 130, 16, 8, 16
    sx = jnp.asarray(rng.normal(size=(n, nx)), jnp.float32)
    sy = jnp.asarray(rng.normal(size=(n, ny)), jnp.float32)
    sz = jnp.asarray(rng.normal(size=(n, nz)), jnp.float32)
    mesh = jnp.asarray(rng.normal(size=(nx, ny, nz)), jnp.float32)
    g_p = pallas_separable_gather(mesh, sx, sy, sz, interpret=True)
    g_x = _separable_gather(mesh, sx, sy, sz)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-4)


def test_pallas_spread_windows_matches_xla():
    """Fused Mosaic spread windows == the jnp windowed spread (interpret)."""
    import jax

    from nvalchemiops_tpu.spline_windowed import (
        build_mesh_tiles, mesh_tile_capacity, windowed_spread,
    )

    rng = np.random.default_rng(7)
    n, mesh_dims = 500, (16, 16, 16)
    cell = jnp.eye(3, dtype=jnp.float32) * 20.0
    pos = jnp.asarray(rng.uniform(0, 20.0, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    cap = mesh_tile_capacity(n, mesh_dims)
    for need_grad in (True, False):
        tiles = build_mesh_tiles(pos, cell, mesh_dims, 4, cap,
                                 need_grad=need_grad)
        m_x = windowed_spread(tiles, q)
        m_p = windowed_spread(tiles, q, engine="pallas")
        np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x),
                                   atol=1e-6)


def test_pme_spread_engine_pallas_matches_xla():
    """PME reciprocal E+F with spread_engine='pallas' == the xla spread."""
    from nvalchemiops_tpu.interactions.electrostatics.pme import (
        _pme_reciprocal_impl,
    )

    rng = np.random.default_rng(8)
    n = 300
    cell = jnp.eye(3, dtype=jnp.float32) * 14.0
    pos = jnp.asarray(rng.uniform(0, 14.0, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    q = q - q.mean()
    alpha = jnp.asarray([0.4], jnp.float32)
    args = (pos, q, cell.reshape(1, 3, 3), alpha, (16, 16, 16), 4, None,
            True, False, None, None)
    e_x, f_x, _ = _pme_reciprocal_impl(*args)
    e_p, f_p, _ = _pme_reciprocal_impl(*args, spread_engine="pallas")
    np.testing.assert_allclose(np.asarray(e_p), np.asarray(e_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x), atol=1e-5)


def test_window_sweep_x_block_parity():
    """x-blocked window sweep == the single-block sweep (interpret).

    Wide rows (cx*lane_w > 2048 lanes, e.g. 524k atoms at cx=26) split
    into x-block grid steps; every split must reproduce the unblocked
    accumulators exactly (same adds, same order within a cell).
    """
    from nvalchemiops_tpu.pallas.window_sweep import (
        window_lane_width,
        window_rows,
        window_sweep,
    )

    rng = np.random.default_rng(7)
    dims, radius, cap = (2, 3, 4), (1, 1, 1), 8
    cz, cy, cx = dims
    rz, ry, rx = radius
    lane_w = window_lane_width(cap, rx)
    ez, ey, ex = cz + 2 * rz, cy + 2 * ry, cx + 2 * rx
    own = {"x": jnp.asarray(rng.normal(size=(cz, cy, cx * cap, 1)),
                            jnp.float32)}
    ext = jnp.asarray(rng.normal(size=(ez, ey, ex, cap)), jnp.float32)
    wrows = {"y": window_rows(ext, rx, cap, lane_w, park=0.0)}

    def body(own, crow, ccolt, home):
        pair = own["x"][None] * crow["y"]  # [n_off, cap, lane_w]
        pair = jnp.where(
            jnp.concatenate([home[None],
                             jnp.ones_like(pair[1:], bool)], axis=0),
            pair, 0.0)
        return (pair,), (pair,)

    results = {}
    for bx in (None, 1, 2, 4):
        (own_acc,), (ext_acc,) = window_sweep(
            dims, radius, cap, own, wrows, {}, body, 1, 1,
            lane_w=lane_w, interpret=True, x_block=bx)
        results[bx] = (np.asarray(own_acc), np.asarray(ext_acc))
    for bx in (1, 2, 4):
        np.testing.assert_allclose(results[bx][0], results[None][0],
                                   rtol=1e-6)
        np.testing.assert_allclose(results[bx][1], results[None][1],
                                   rtol=1e-6)
    assert np.abs(results[None][0]).sum() > 0  # nontrivial sweep
