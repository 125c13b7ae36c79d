# SPDX-License-Identifier: Apache-2.0
"""Probe: fused super-chunk Pallas block engine vs XLA row sweep (Coulomb)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    estimate_grid_geometry, build_atom_grid, grid_coulomb_energy_forces,
)

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
q = jnp.asarray(rng.normal(size=n), jnp.float32)

dims, radius, _ = estimate_grid_geometry(cell, pbc, cutoff, n)
cap = 48
g0 = build_atom_grid(pos, cell, pbc, dims, radius, cap)
print(f"N={n} dims={dims} cap={cap}", flush=True)

# correctness on-chip first
e1, f1 = grid_coulomb_energy_forces(g0, q, cutoff, 0.35)
e2, f2 = grid_coulomb_energy_forces(g0, q, cutoff, 0.35, engine="block")
print("maxdiff e", float(jnp.max(jnp.abs(e1 - e2))),
      "f", float(jnp.max(jnp.abs(f1 - f2))), flush=True)

for eng in [None, "block"]:
    def step(p, eng=eng):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap)
        e, f = grid_coulomb_energy_forces(gg, q, cutoff, 0.35, engine=eng)
        return f
    t = measure(step, dep, (pos,), iters=3)
    print(f"coulomb engine={eng}: {t*1e3:7.2f} ms", flush=True)
