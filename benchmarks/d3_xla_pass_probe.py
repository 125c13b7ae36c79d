# SPDX-License-Identifier: Apache-2.0
"""Pass split of the default (xla row-sweep) grid D3 at bench scale.

Successive prefixes via DCE: CN only (return cn_plane), passes 1-2
(skip_chain=True, return e_pl), full.  Also sweeps zmax to expose how
pass-2 cost scales with the feature dim zm = (zmax+1)*mesh (candidate
feature-window materialization is the suspected dominant term).
"""
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
cutoff = 9.0

dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n,
                                           target_occupancy=0.75)
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
print(f"N={n} dims={dims} cap={cap}", flush=True)


def build(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


t_nl = measure(lambda p: build(p).ext_px, dep, (pos,), iters=8)
print(f"grid build   : {t_nl*1e3:7.2f} ms", flush=True)


def make_tables(zmax, seed=0):
    r = np.random.default_rng(seed)
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
    return numbers, rcov, r4r2, cna, jnp.asarray(c6_np, jnp.float32)


def prep(gg, numbers, rcov, r4r2, cna, c6):
    dtype = jnp.float32
    zmax1 = rcov.shape[0]
    mesh = cna.shape[1]
    mask_a = gd3.element_c6_mask(c6)[numbers].astype(dtype)
    c6p = jnp.transpose(c6, (0, 2, 1, 3)).reshape(zmax1, mesh, zmax1 * mesh)
    z_plane = scatter_to_grid(gg, numbers, fill=0)
    rcov_plane = scatter_to_grid(gg, rcov[numbers])
    r4r2_plane = scatter_to_grid(gg, r4r2[numbers])
    return dict(
        z_plane=z_plane, z_ext=_extend_like(gg, z_plane, 0),
        rcov_plane=rcov_plane, rcov_ext=_extend_like(gg, rcov_plane, 0.0),
        r4r2_plane=r4r2_plane, r4r2_ext=_extend_like(gg, r4r2_plane, 0.0),
        cna_a=cna[numbers], mask_a=mask_a, c6p_a=c6p[numbers],
        mesh=int(mesh), zmax1=int(zmax1),
    )


def run_impl(p, tables, out_idx, skip_chain):
    numbers, rcov, r4r2, cna, c6 = tables
    gg = build(p)
    d = prep(gg, numbers, rcov, r4r2, cna, c6)
    out = gd3._grid_d3_impl(
        gg, d["z_plane"], d["z_ext"], d["rcov_plane"], d["rcov_ext"],
        d["r4r2_plane"], d["r4r2_ext"], d["cna_a"], d["mask_a"], d["c6p_a"],
        9.0, 0.4, 4.2, 1.0, 1.8, 16.0, -4.0,
        gg.dims, gg.radius, gg.cap, d["mesh"], d["zmax1"],
        skip_chain=skip_chain,
    )
    return out[out_idx]


T16 = make_tables(16)
# cn_plane is index 4 both with and without skip_chain
t_cn = measure(lambda p: run_impl(p, T16, 4, True), dep, (pos,), iters=4)
print(f"CN pass      : {(t_cn-t_nl)*1e3:7.2f} ms", flush=True)
t_e = measure(lambda p: run_impl(p, T16, 0, True), dep, (pos,), iters=3)
print(f"+ feats+direct: {(t_e-t_cn)*1e3:7.2f} ms", flush=True)
t_f = measure(lambda p: run_impl(p, T16, 1, False), dep, (pos,), iters=3)
print(f"+ chain pass : {(t_f-t_e)*1e3:7.2f} ms", flush=True)
print(f"full D3      : {(t_f-t_nl)*1e3:7.2f} ms", flush=True)

for zmax in (4, 8, 32):
    T = make_tables(zmax)
    t_ez = measure(lambda p: run_impl(p, T, 0, True), dep, (pos,), iters=3)
    zm = (zmax + 1) * 5
    print(f"passes1-2 zm={zm:3d}: {(t_ez-t_nl)*1e3:7.2f} ms", flush=True)
print("done", flush=True)
