# SPDX-License-Identifier: Apache-2.0
"""Micro-variants of the dense separable PME spread at 64 x 2000 / 32^3.

The windowed batch-PME spread costs 7.6 of the 8.7 ms total (round-4
stage probe); the dense separable spread *should* be ~1-2 ms by traffic
(one [2048, 1024] intermediate per system) yet measures 10.2 ms.  This
probe isolates: weight-matrix build, the scan+dynamic_slice harness, the
outer-product einsum, and the contraction-order alternatives.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from nvalchemiops_tpu.spline import (  # noqa: E402
    _separable_spread,
    _stencil_axis_matrices,
)

dep = perturb_positions()
rng = np.random.default_rng(5)
B, npa, box = 64, 2000, 27.0
mesh = (32, 32, 32)
pos = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
cell = jnp.asarray(np.eye(3) * box, jnp.float32)
hi = jax.lax.Precision.HIGHEST

_ = measure(lambda p: jnp.sum(p * p), dep, (pos,), iters=8)


@jax.jit
def weights_only(p):
    def one(pp):
        mats, _ = _stencil_axis_matrices(pp, cell, mesh, 4, None)
        return mats[0].sum() + mats[1].sum() + mats[2].sum()
    return jax.vmap(one)(p)


@jax.jit
def full_current(p):
    def one(pp, qq):
        mats, _ = _stencil_axis_matrices(pp, cell, mesh, 4, None)
        return _separable_spread(qq, *mats)
    return jax.vmap(one)(p, q)


@jax.jit
def noscan(p):
    def one(pp, qq):
        (sx, sy, sz), _ = _stencil_axis_matrices(pp, cell, mesh, 4, None)
        t = (sy[:, :, None] * sz[:, None, :]).reshape(npa, -1)
        qx = qq[:, None] * sx
        return jax.lax.dot_general(
            qx, t, (((0,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32).reshape(mesh)
    return jax.vmap(one)(p, q)


@jax.jit
def noscan_default_prec(p):
    def one(pp, qq):
        (sx, sy, sz), _ = _stencil_axis_matrices(pp, cell, mesh, 4, None)
        t = (sy[:, :, None] * sz[:, None, :]).reshape(npa, -1)
        qx = qq[:, None] * sx
        return jax.lax.dot_general(
            qx, t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(mesh)
    return jax.vmap(one)(p, q)


@jax.jit
def einsum_auto(p):
    def one(pp, qq):
        (sx, sy, sz), _ = _stencil_axis_matrices(pp, cell, mesh, 4, None)
        return jnp.einsum("n,nx,ny,nz->xyz", qq, sx, sy, sz, precision=hi)
    return jax.vmap(one)(p, q)


@jax.jit
def two_matmul(p):
    # M[x, (y,z)] = sx^T [32, n] @ (q * (sy ⊗ sz)) — but build the n-major
    # [n, y*z] with a matmul too: t[n, yz] = sy[n, y] rows times sz — no,
    # keep the VPU outer product; contract x first instead (x is the
    # cheapest axis): A[y, (n)] ... simpler: contract z LAST:
    # P[(x,y), n] = (sx ⊗ sy) — too big.  Use: U[y, z-major]…
    def one(pp, qq):
        (sx, sy, sz), _ = _stencil_axis_matrices(pp, cell, mesh, 4, None)
        # W[n, x*y] via outer (32*32=1024), then contract n with (q*sz)
        w = (sx[:, :, None] * sy[:, None, :]).reshape(npa, -1)
        qz = qq[:, None] * sz
        out = jax.lax.dot_general(
            w, qz, (((0,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32)   # [x*y, z]
        return out.reshape(mesh)
    return jax.vmap(one)(p, q)


for name, fn in (("weights only", weights_only),
                 ("current (scan)", full_current),
                 ("noscan HIGHEST", noscan),
                 ("noscan default", noscan_default_prec),
                 ("einsum 4-op", einsum_auto),
                 ("xy-major matmul", two_matmul)):
    try:
        t = measure(fn, dep, (pos,), iters=4)
        print(f"{name:18s}: {t*1e3:8.3f} ms", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{name:18s}: FAILED {type(exc).__name__}: {exc}"[:200],
              flush=True)
print("done", flush=True)
