# SPDX-License-Identifier: Apache-2.0
"""Probe: D3 + Coulomb grid-sweep time vs grid capacity at bench scale.

The geometry estimator sizes cap for Poisson-random gases (mean + 5 sigma);
near-crystalline systems have near-deterministic occupancy, so cap (and the
x-window W = (2Rx+1)*cap, the lane dimension of every pair block) can shrink
to the observed max.  Pair compute scales ~ cap * W_padded.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    estimate_grid_geometry, build_atom_grid, grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

dep = perturb_positions()
rng = np.random.default_rng(0)
zmax = 16
rcov = jnp.asarray(np.r_[0, rng.uniform(.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, zmax)], jnp.float32)
cna = jnp.asarray(np.vstack([np.zeros(5), np.cumsum(rng.uniform(.3, 1, (zmax, 5)), 1)]), jnp.float32)
c6 = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5)); c6[0] = 0; c6[:, 0] = 0
c6 = 0.5 * (c6 + np.swapaxes(np.swapaxes(c6, 0, 1), 2, 3))
c6 = jnp.asarray(c6, jnp.float32)

n_rep, a = 48, 3.0
g = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"), -1).reshape(-1, 3) * a
pos_np = g + rng.uniform(-0.2, 0.2, g.shape)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
pbc = np.array([True] * 3)
cutoff = 9.0
numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
charges = jnp.asarray(rng.normal(size=n), jnp.float32)

dims, radius, cap_est = estimate_grid_geometry(cell, pbc, cutoff, n, target_occupancy=0.75)
g0 = build_atom_grid(pos, cell, pbc, dims, radius, cap_est)
obs = int(jax.device_get(g0.counts_max))
print(f"N={n} dims={dims} radius={radius} cap_est={cap_est} observed_max={obs}", flush=True)

caps = sorted({cap_est, max(4 * ((obs + 3) // 4), 4), 4 * ((obs + 7) // 8 * 2), 40, 32})
for cap in caps:
    if cap < obs:
        continue

    def d3_step(p, cap=cap):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap)
        e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8)
        return f

    def coul_step(p, cap=cap):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap)
        e, f = grid_coulomb_energy_forces(gg, charges, cutoff, 0.35)
        return f

    t_d3 = measure(d3_step, dep, (pos,), iters=3)
    t_c = measure(coul_step, dep, (pos,), iters=3)
    print(f"cap={cap:3d} W={3*cap:4d}: D3 {t_d3*1e3:7.2f}ms  Coulomb {t_c*1e3:7.2f}ms", flush=True)
