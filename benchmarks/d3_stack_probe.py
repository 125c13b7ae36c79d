# SPDX-License-Identifier: Apache-2.0
"""Probe: pass-2 einsum variants at bench scale (110k atoms, 9 A).

Variants of the three bilinear C6-interpolation einsums:
  split/f32   — current default (three einsums, f32 feature planes)
  stack/f32   — zacc+z_di lhs-stacked (shared rf window read once)
  split/bf16  — bf16 feature-plane storage (halves windowed reads)
  stack/bf16  — both
All are bit-identical (stack) or within the documented bf16 engine
tolerance (MXU already casts operands to bf16).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    build_atom_grid, choose_grid_origin, estimate_grid_geometry,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

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

dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n,
                                           target_occupancy=0.75)
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
print(f"N={n} dims={dims} cap={cap}", flush=True)

numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
rcov = jnp.asarray(np.r_[0.0, rng.uniform(0.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0.0, rng.uniform(2.0, 5.0, zmax)], jnp.float32)
cna = jnp.asarray(
    np.vstack([np.zeros(5), np.cumsum(rng.uniform(0.3, 1.0, (zmax, 5)), 1)]),
    jnp.float32)
c6_np = rng.uniform(5.0, 40.0, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0.0
c6_np[:, 0] = 0.0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, jnp.float32)


def build(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


t_nl = measure(lambda p: build(p).ext_px, dep, (pos,), iters=8)
print(f"grid build       : {t_nl*1e3:7.2f} ms", flush=True)

for label, bilinear, fdt in (
    ("split/f32 ", "split", None),
    ("stack/f32 ", "stack", None),
    ("split/bf16", "split", jnp.bfloat16),
    ("stack/bf16", "stack", jnp.bfloat16),
):
    def step(p, b=bilinear, f=fdt):
        gg = build(p)
        _, forces, _ = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna,
                                  cutoff, 0.4, 4.2, 1.8,
                                  bilinear=b, feature_dtype=f)
        return forces

    t = measure(step, dep, (pos,), iters=3)
    print(f"D3 {label}: {(t-t_nl)*1e3:7.2f} ms", flush=True)
print("done", flush=True)
