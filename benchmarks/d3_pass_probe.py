# SPDX-License-Identifier: Apache-2.0
"""Decompose tuned grid-D3 (block engine, origin shift, M~128) by pass.

Times successively larger prefixes of the pipeline by calling the internal
impl with bodies disabled is invasive; instead approximate with: grid build,
CN-only (grid_coordination_numbers block path), full D3, and full fused
D3+chain via the public API.  The chain-pass cost falls out by differencing.
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
zmax = 16
numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
rcov = jnp.asarray(np.r_[0, rng.uniform(.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, zmax)], jnp.float32)
cna = jnp.asarray(np.vstack([np.zeros(5),
                             np.cumsum(rng.uniform(.3, 1, (zmax, 5)), 1)]),
                  jnp.float32)
c6_np = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0
c6_np[:, 0] = 0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, jnp.float32)

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

# CN pass alone through the same block harness: call the block impl but
# read only the cn output (XLA DCE removes passes 2-3 whose outputs are
# unused ONLY if nothing aliases; returning cn_plane forces pass 1 alone
# when the other outputs are dropped before jit boundary).
from functools import partial


@jax.jit
def cn_only(p):
    gg = build(p)
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
        element_c6_mask,
    )
    dtype = jnp.float32
    nums = numbers
    zmax1 = rcov.shape[0]
    mesh = cna.shape[1]
    rcov_a = rcov[nums]
    r4r2_a = r4r2[nums]
    cna_a = cna[nums]
    mask_a = element_c6_mask(c6)[nums].astype(dtype)
    c6p = jnp.transpose(c6, (0, 2, 1, 3)).reshape(zmax1, mesh, zmax1 * mesh)
    c6p_a = c6p[nums]
    z_plane = scatter_to_grid(gg, nums, fill=0)
    rcov_plane = scatter_to_grid(gg, rcov_a)
    r4r2_plane = scatter_to_grid(gg, r4r2_a)
    z_ext = _extend_like(gg, z_plane, 0)
    rcov_ext = _extend_like(gg, rcov_plane, 0.0)
    r4r2_ext = _extend_like(gg, r4r2_plane, 0.0)
    out = gd3._grid_d3_block_impl(
        gg, z_plane, z_ext, rcov_plane, rcov_ext, r4r2_plane, r4r2_ext,
        cna_a, mask_a, c6p_a, 9.0, 0.4, 4.2, 1.0, 1.8, 16.0, -4.0,
        gg.dims, gg.radius, gg.cap, int(mesh), int(zmax1), False,
    )
    return out[4]  # cn_plane only -> passes 2/3 dead-code-eliminated


t_cn = measure(cn_only, dep, (pos,), iters=4)
print(f"CN pass      : {(t_cn-t_nl)*1e3:7.2f} ms", flush=True)


@jax.jit
def no_chain(p):
    gg = build(p)
    # energy plane comes straight from pass 2; chain pass only affects
    # forces, so returning e_pl + cn exercises passes 1-2 only
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
        element_c6_mask,
    )
    dtype = jnp.float32
    nums = numbers
    zmax1 = rcov.shape[0]
    mesh = cna.shape[1]
    rcov_a = rcov[nums]
    r4r2_a = r4r2[nums]
    cna_a = cna[nums]
    mask_a = element_c6_mask(c6)[nums].astype(dtype)
    c6p = jnp.transpose(c6, (0, 2, 1, 3)).reshape(zmax1, mesh, zmax1 * mesh)
    c6p_a = c6p[nums]
    z_plane = scatter_to_grid(gg, nums, fill=0)
    rcov_plane = scatter_to_grid(gg, rcov_a)
    r4r2_plane = scatter_to_grid(gg, r4r2_a)
    z_ext = _extend_like(gg, z_plane, 0)
    rcov_ext = _extend_like(gg, rcov_plane, 0.0)
    r4r2_ext = _extend_like(gg, r4r2_plane, 0.0)
    out = gd3._grid_d3_block_impl(
        gg, z_plane, z_ext, rcov_plane, rcov_ext, r4r2_plane, r4r2_ext,
        cna_a, mask_a, c6p_a, 9.0, 0.4, 4.2, 1.0, 1.8, 16.0, -4.0,
        gg.dims, gg.radius, gg.cap, int(mesh), int(zmax1), False,
    )
    return out[0]  # e_pl: passes 1-2 (chain pass dead)


t_e = measure(no_chain, dep, (pos,), iters=3)
print(f"+ direct pass: {(t_e-t_cn)*1e3:7.2f} ms", flush=True)


def full(p):
    gg = build(p)
    _, f, _ = gd3.grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                             0.4, 4.2, 1.8)
    return f


t_f = measure(full, dep, (pos,), iters=3)
print(f"+ chain pass : {(t_f-t_e)*1e3:7.2f} ms", flush=True)
print(f"full D3      : {(t_f-t_nl)*1e3:7.2f} ms", flush=True)


def full_xla(p):
    gg = build(p)
    _, f, _ = gd3.grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                             0.4, 4.2, 1.8, engine="xla")
    return f


t_x = measure(full_xla, dep, (pos,), iters=3)
print(f"full D3 (xla): {(t_x-t_nl)*1e3:7.2f} ms", flush=True)
