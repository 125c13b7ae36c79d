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
