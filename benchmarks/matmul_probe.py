# SPDX-License-Identifier: Apache-2.0
"""Standalone batched-matmul shapes probe: is the pass-2 einsum latency-bound
on batch count?  Measures [B, M, K] x [B, W, K] -> [B, M, W] for the current
per-cell blocking vs x-merged blockings (fewer, bigger batches).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions

dep = perturb_positions()
rng = np.random.default_rng(0)

shapes = [
    # (B, M, W, K) = (cells, cap, window, feat)
    (4096, 48, 144, 85),    # current per-cell window
    (4096, 48, 48, 85),     # per-chunk (one x-slice)
    (1024, 192, 288, 85),   # G=4 x-merge
    (512, 384, 480, 85),    # G=8 x-merge
    (256, 768, 864, 85),    # full-row merge
]
for B, M, W, K in shapes:
    lhs = jnp.asarray(rng.normal(size=(B, M, K)), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(B, W, K)), jnp.float32)

    def step(l, r):
        return jnp.einsum("bif,bjf->bij", l, r,
                          preferred_element_type=jnp.float32)

    def dep2(args, out):
        h = jnp.sum(out.ravel()[:8])
        eps = (jnp.abs(h) % 2.0) * 1e-30
        return (args[0] + eps.astype(args[0].dtype), args[1])

    t = measure(step, dep2, (lhs, rhs), iters=4)
    gf = B * M * W * K * 2 / 1e9
    print(f"B={B:5d} M={M:4d} W={W:4d} K={K}: {t*1e3:7.3f} ms  "
          f"({gf/t/1e3:7.1f} TF/s)", flush=True)
