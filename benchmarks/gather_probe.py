# SPDX-License-Identifier: Apache-2.0
"""Probe: PME windowed-gather force-path cost decomposition at bench scale.

Suspects for the 4.3 ms E->E+F delta: (a) four per-atom slot gathers,
(b) three thin-output [t, cap, 12] einsums, (c) repeated tyx builds.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu import spline_windowed as sw

rng = np.random.default_rng(0)
n_rep, a = 48, 3.0
g = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"),
             -1).reshape(-1, 3) * a
pos_np = g + rng.uniform(-0.2, 0.2, g.shape)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
q = jnp.asarray(rng.normal(size=n), jnp.float32)
mesh_dims = (128, 128, 128)
CAP = sw.mesh_tile_capacity(n, mesh_dims)
print(f"N={n} mesh={mesh_dims} cap={CAP}", flush=True)

tiles0 = sw.build_mesh_tiles(pos, cell, mesh_dims, 4, CAP)
mesh0 = sw.windowed_spread(tiles0, q)
dep = perturb_positions()


def with_tiles(fn):
    def run(p):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
        m = sw.windowed_spread(t, q)
        return fn(t, m)
    return run


base = with_tiles(lambda t, m: m[0, 0, 0])
t_base = measure(base, dep, (pos,), iters=6)
print(f"tiles+spread base : {t_base*1e3:7.2f} ms", flush=True)

g1 = with_tiles(lambda t, m: sw.windowed_gather(t, m))
t_g1 = measure(g1, dep, (pos,), iters=6)
print(f"+ gather(E)       : {(t_g1-t_base)*1e3:7.2f} ms", flush=True)

g4 = with_tiles(lambda t, m: sw.windowed_gather(t, m, with_gradient=True)[1])
t_g4 = measure(g4, dep, (pos,), iters=6)
print(f"+ gather(E+grad)  : {(t_g4-t_base)*1e3:7.2f} ms", flush=True)


# per-atom slot gathers alone: 1 vs 4 vs one [4, :] lane gather
def mk_planes(t, m):
    ntiles = t.smat.shape[0]
    return jnp.arange(ntiles * t.cap, dtype=jnp.float32), t.flat_slot


def pg1(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
    plane, slot = mk_planes(t, None)
    return plane[jnp.minimum(slot, plane.size - 1)]


def pg4(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
    plane, slot = mk_planes(t, None)
    slot = jnp.minimum(slot, plane.size - 1)
    return sum(plane[slot] * float(i) for i in range(1, 5))


def pg_lane(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
    plane, slot = mk_planes(t, None)
    slot = jnp.minimum(slot, plane.size - 1)
    p4 = jnp.stack([plane, plane * 2, plane * 3, plane * 4], axis=0)  # [4, S]
    return p4[:, slot]


def t_tiles_only(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
    return t.smat[0, 0, 0]


tt = measure(t_tiles_only, dep, (pos,), iters=6)
for name, fn in (("1 slot gather", pg1), ("4 slot gathers", pg4),
                 ("[4,:] lane gather", pg_lane)):
    t = measure(fn, dep, (pos,), iters=6)
    print(f"{name:18s}: {(t-tt)*1e3:7.2f} ms", flush=True)
