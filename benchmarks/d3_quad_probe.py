# SPDX-License-Identifier: Apache-2.0
"""Probe: pass-2 bilinear layout 'split' (3 dots) vs 'quad' (1 stacked dot)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    build_atom_grid, choose_grid_origin, estimate_grid_geometry,
    scatter_to_grid, _extend_like,
)
from nvalchemiops_tpu.interactions.dispersion import grid_d3 as gd3

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = 48, 3.0
gpts = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"),
                -1).reshape(-1, 3) * a
pos_np = gpts + rng.uniform(-0.2, 0.2, gpts.shape)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
pbc = np.array([True] * 3)

dims, radius, cap = estimate_grid_geometry(cell, pbc, 9.0, n,
                                           target_occupancy=0.75)
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
print(f"N={n} dims={dims} cap={cap}", flush=True)

zmax = 16
r = np.random.default_rng(1)
numbers = jnp.asarray(r.integers(1, zmax + 1, n), jnp.int32)
rcov = jnp.asarray(np.r_[0, r.uniform(.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0, r.uniform(2, 5, zmax)], jnp.float32)
cna = jnp.asarray(np.vstack([np.zeros(5),
                             np.cumsum(r.uniform(.3, 1, (zmax, 5)), 1)]),
                  jnp.float32)
c6_np = r.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0
c6_np[:, 0] = 0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, jnp.float32)

mesh = 5
zmax1 = zmax + 1
mask_a = gd3.element_c6_mask(c6)[numbers].astype(jnp.float32)
c6p = jnp.transpose(c6, (0, 2, 1, 3)).reshape(zmax1, mesh, zmax1 * mesh)
c6p_a = c6p[numbers]
cna_a = cna[numbers]


def build(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


def run(p, out_idx, skip_chain, bilinear):
    gg = build(p)
    z_plane = scatter_to_grid(gg, numbers, fill=0)
    rcov_plane = scatter_to_grid(gg, rcov[numbers])
    r4r2_plane = scatter_to_grid(gg, r4r2[numbers])
    out = gd3._grid_d3_impl(
        gg, z_plane, _extend_like(gg, z_plane, 0),
        rcov_plane, _extend_like(gg, rcov_plane, 0.0),
        r4r2_plane, _extend_like(gg, r4r2_plane, 0.0),
        cna_a, mask_a, c6p_a,
        9.0, 0.4, 4.2, 1.0, 1.8, 16.0, -4.0,
        gg.dims, gg.radius, gg.cap, mesh, zmax1,
        skip_chain=skip_chain, bilinear=bilinear,
    )
    return out[out_idx]


# correctness cross-check first (one shot)
e_s = jax.jit(lambda p: run(p, 0, True, "split"))(pos)
e_q = jax.jit(lambda p: run(p, 0, True, "quad"))(pos)
d = float(jnp.max(jnp.abs(e_s - e_q)) / (jnp.max(jnp.abs(e_s)) + 1e-30))
print(f"quad vs split max rel energy-plane diff: {d:.2e}", flush=True)

for bl in ("split", "quad"):
    t12 = measure(lambda p: run(p, 0, True, bl), dep, (pos,), iters=3)
    tf = measure(lambda p: run(p, 1, False, bl), dep, (pos,), iters=3)
    print(f"{bl:5s}: passes1-2 {t12*1e3:6.2f} ms | full {tf*1e3:6.2f} ms",
          flush=True)
print("done", flush=True)
