# SPDX-License-Identifier: Apache-2.0
"""Probe: windowed-gather contraction order (m-first vs z-first), E and E+F."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu import spline_windowed as sw
from nvalchemiops_tpu.interactions.electrostatics.pme import _pme_reciprocal_impl

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = 48, 3.0
g = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"), -1).reshape(-1, 3) * a
pos_np = g + rng.uniform(-0.2, 0.2, g.shape)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
q = jnp.asarray(rng.normal(size=n), jnp.float32)
alpha = jnp.asarray([0.35], jnp.float32)
mesh_dims = (128, 128, 128)
CAP = sw.observed_tile_capacity(pos, cell, mesh_dims)
mesh = jnp.asarray(rng.normal(size=mesh_dims), jnp.float32)
print(f"N={n} mesh={mesh_dims} cap={CAP}", flush=True)

for name, wg, order in [
    ("E gather m", False, "m"), ("E gather z", False, "z"),
    ("EF gather m", True, "m"), ("EF gather z", True, "z"),
]:
    def fn(p, wg=wg, order=order):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
        out = sw.windowed_gather(t, mesh, with_gradient=wg, order=order)
        return out[1] if wg else out
    t = measure(fn, dep, (pos,), iters=5)
    print(f"{name:12s}: {t*1e3:7.2f} ms (incl binning)", flush=True)


def full(p):
    e, f, cg = _pme_reciprocal_impl(
        p, q, cell.reshape(1, 3, 3), alpha, mesh_dims, 4, None, True, False,
        None, None, tile_capacity=CAP)
    return f


t = measure(full, dep, (pos,), iters=4)
print(f"full E+F (auto orders): {t*1e3:7.2f} ms", flush=True)
print("done", flush=True)
