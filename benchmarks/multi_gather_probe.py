# SPDX-License-Identifier: Apache-2.0
"""Probe: k separate per-atom gathers vs one stacked row gather."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure

rng = np.random.default_rng(0)
N = 110592
S = 16 * 16 * 16 * 48
idx = jnp.asarray(rng.integers(0, S, N), jnp.int32)
planes = [jnp.asarray(rng.normal(size=S), jnp.float32) for _ in range(4)]


def dep(args, out):
    # data-dependent perturbation: shift indices by the output's parity bit
    (ix,) = args
    h = jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:8])
    bit = (jnp.abs(h).astype(jnp.int32)) % 2
    return (jnp.minimum(ix + bit, S - 1),)


def four_gathers(ix):
    return sum(p[ix] for p in planes)


def one_row_gather(ix):
    st = jnp.stack(planes, axis=-1)
    return jnp.sum(st[ix], axis=-1)


def one_scalar_gather(ix):
    return planes[0][ix]


def prestacked(ix, st=jnp.stack(planes, axis=-1)):
    return jnp.sum(st[ix], axis=-1)


for name, fn in [("1 scalar gather", one_scalar_gather),
                 ("4 scalar gathers", four_gathers),
                 ("stack + row gather", one_row_gather),
                 ("row gather (prestacked)", prestacked)]:
    t = measure(fn, dep, (idx,), iters=8)
    print(f"{name:24s}: {t*1e3:7.3f} ms", flush=True)
print("done", flush=True)
