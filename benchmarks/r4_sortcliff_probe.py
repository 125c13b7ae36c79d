# SPDX-License-Identifier: Apache-2.0
"""Locate the grid-build cost cliff between 97k and 262k atoms.

The NL suite rates are ~0.019 us/atom up to 97k, then 0.061 at 262k and
0.032 at 512k — a ~14 ms step that does not scale with N.  Geometry is
proportionate (4.4-4.5x slot slack at every size), so the suspect is the
build's payload-carrying bucket sort hitting an XLA sort-path change
(2^17 = 131,072 sits between the sizes).  Times jnp.sort variants and
the full build across the boundary.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal, tuned_grid  # noqa: E402
from nvalchemiops_tpu.grid import build_atom_grid  # noqa: E402

dep = perturb_positions()
_ = measure(lambda p: jnp.sum(p * p), dep,
            (jnp.zeros((8, 8), jnp.float32),), iters=8)

for n in (97336, 131072, 140000, 262144):
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.integers(0, 1 << 22, n), jnp.int32)
    vals = jnp.asarray(rng.normal(size=n), jnp.float32)

    def s1(k):
        return jnp.sort(k)

    def s2(k):
        return jax.lax.sort((k, vals), num_keys=1)[1]

    def s3(k):
        return jnp.argsort(k)

    def dep_int(a, o):
        # genuine (non-foldable) data dependence: nudge keys by 0/1
        leaves = jax.tree_util.tree_leaves(o)
        h = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return (a[0] + (h % 2.0).astype(a[0].dtype),)

    t1 = measure(s1, dep_int, (keys,), iters=8)
    t2 = measure(s2, dep_int, (keys,), iters=8)
    t3 = measure(s3, dep_int, (keys,), iters=8)
    print(f"n={n}: sort(key) {t1*1e3:7.3f}  sort(key,payload) {t2*1e3:7.3f}"
          f"  argsort {t3*1e3:7.3f} ms", flush=True)

for n_rep in (46, 51, 64):
    pos_np, cell_np = crystal(n_rep, 3.0)
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, jnp.float32)
    cell = jnp.asarray(cell_np, jnp.float32)
    pbc = np.array([True] * 3)
    dims, radius, cap, origin = tuned_grid(pos, cell, pbc, 4.5, n)
    t = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                          origin=origin).ext_px,
                dep, (pos,), iters=6)
    print(f"build n={n}: {t*1e3:7.3f} ms ({t*1e6/n:.4f} us/atom)",
          flush=True)
print("done", flush=True)
