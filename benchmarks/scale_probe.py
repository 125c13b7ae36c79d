# SPDX-License-Identifier: Apache-2.0
"""Half-million-atom scale check: grid build + D3 + Coulomb at 512,000 atoms.

The reference's largest published config is the 524,288-atom cell-list
build (18.44 ms on H100, 2.07 GB).  Same crystal recipe as bench.py at
n_rep = 80 (box 240 A, 9 A cutoff).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    build_atom_grid, choose_grid_origin, estimate_grid_geometry,
    grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = int(os.environ.get("NREP", "80")), 3.0
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
charges = jnp.asarray(rng.normal(size=n), jnp.float32)
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
if os.environ.get("DIMS"):
    dims = (int(os.environ["DIMS"]),) * 3
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
print(f"N={n} dims={dims} cap={cap} origin={origin_np}", flush=True)


def build(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


t_nl = measure(lambda p: build(p).ext_px, dep, (pos,), iters=6)
print(f"grid build 512k : {t_nl*1e3:7.2f} ms  ({t_nl*1e6/n:.4f} us/atom)",
      flush=True)


def d3_step(p):
    _, f, _ = grid_dftd3(build(p), numbers, rcov, r4r2, c6, cna, cutoff,
                         0.4, 4.2, 1.8)
    return f


t_d3 = measure(d3_step, dep, (pos,), iters=2)
print(f"D3 512k         : {(t_d3-t_nl)*1e3:7.2f} ms  "
      f"({(t_d3-t_nl)*1e6/n:.4f} us/atom)", flush=True)


def coul_step(p):
    e, f = grid_coulomb_energy_forces(build(p), charges, cutoff, 0.35)
    return f


t_c = measure(coul_step, dep, (pos,), iters=2)
print(f"Coulomb 512k    : {(t_c-t_nl)*1e3:7.2f} ms", flush=True)
