# SPDX-License-Identifier: Apache-2.0
"""Probe: Coulomb engines + fused D3+Coulomb at the new G policy (M~128).

The earlier measurement (G=16 policy) had block slower than the jnp sweep
(18.2 vs 14.4 ms at cap=48); the M=128 policy may flip that.  Also re-test
the fused grid_dftd3_coulomb vs separate calls at the tuned config.
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
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
    grid_dftd3, grid_dftd3_coulomb,
)

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
alpha = 0.35
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
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
print(f"N={n} dims={dims} cap={cap}", flush=True)


def build(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


t_nl = measure(lambda p: build(p).ext_px, dep, (pos,), iters=8)
print(f"grid build        : {t_nl*1e3:7.2f} ms", flush=True)

for eng in (None, "block"):
    def coul(p, eng=eng):
        gg = build(p)
        e, f = grid_coulomb_energy_forces(gg, charges, cutoff, alpha,
                                          engine=eng)
        return f
    t = measure(coul, dep, (pos,), iters=4)
    print(f"coulomb eng={str(eng):5s} : {(t-t_nl)*1e3:7.2f} ms", flush=True)


def sep(p):
    gg = build(p)
    _, fd, _ = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                          0.4, 4.2, 1.8)
    _, fc = grid_coulomb_energy_forces(gg, charges, cutoff, alpha)
    return fd + fc


def fused(p):
    gg = build(p)
    _, fd, _, _, fc = grid_dftd3_coulomb(gg, numbers, charges, rcov, r4r2,
                                         c6, cna, cutoff, 0.4, 4.2, 1.8,
                                         alpha=alpha)
    return fd + fc


t_sep = measure(sep, dep, (pos,), iters=3)
print(f"D3+C separate     : {(t_sep-t_nl)*1e3:7.2f} ms", flush=True)
t_fus = measure(fused, dep, (pos,), iters=3)
print(f"D3+C fused        : {(t_fus-t_nl)*1e3:7.2f} ms", flush=True)
