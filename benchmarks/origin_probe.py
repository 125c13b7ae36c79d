# SPDX-License-Identifier: Apache-2.0
"""Probe: origin-optimized cap=32 grid vs cap=48 for D3 + Coulomb on chip."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    estimate_grid_geometry, build_atom_grid, choose_grid_origin,
    grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = 48, 3.0
g = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"), -1).reshape(-1, 3) * a
pos_np = g + rng.uniform(-0.2, 0.2, g.shape)
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
cna = jnp.asarray(np.vstack([np.zeros(5), np.cumsum(rng.uniform(.3, 1, (zmax, 5)), 1)]), jnp.float32)
c6 = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5)); c6[0] = 0; c6[:, 0] = 0
c6 = 0.5 * (c6 + np.swapaxes(np.swapaxes(c6, 0, 1), 2, 3))
c6 = jnp.asarray(c6, jnp.float32)

dims, radius, _ = estimate_grid_geometry(cell, pbc, cutoff, n)
origin_np, occ = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32)
print(f"N={n} dims={dims} origin={origin_np} occ={occ}", flush=True)

for cap, org in [(32, origin), (40, origin), (48, None)]:
    def d3_step(p, cap=cap, org=org):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=org)
        e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                              0.4, 4.2, 1.8)
        return f

    def coul_step(p, cap=cap, org=org):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=org)
        e, f = grid_coulomb_energy_forces(gg, charges, cutoff, 0.35)
        return f

    t1 = measure(d3_step, dep, (pos,), iters=3)
    t2 = measure(coul_step, dep, (pos,), iters=3)
    print(f"cap={cap} origin={'y' if org is not None else 'n'}: "
          f"D3 {t1*1e3:7.2f} ms  Coulomb {t2*1e3:7.2f} ms", flush=True)
