# SPDX-License-Identifier: Apache-2.0
"""Probe: D3 grid engines (xla / block) at bench scale on the real chip."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import estimate_grid_geometry, build_atom_grid
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
rcov = jnp.asarray(np.r_[0, rng.uniform(.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, zmax)], jnp.float32)
cna = jnp.asarray(np.vstack([np.zeros(5), np.cumsum(rng.uniform(.3, 1, (zmax, 5)), 1)]), jnp.float32)
c6 = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5)); c6[0] = 0; c6[:, 0] = 0
c6 = 0.5 * (c6 + np.swapaxes(np.swapaxes(c6, 0, 1), 2, 3))
c6 = jnp.asarray(c6, jnp.float32)

dims, radius, _ = estimate_grid_geometry(cell, pbc, cutoff, n)
cap = 48
g0 = build_atom_grid(pos, cell, pbc, dims, radius, cap)
print(f"N={n} dims={dims} cap={cap}", flush=True)

e1, f1, _ = grid_dftd3(g0, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8)
e2, f2, _ = grid_dftd3(g0, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8, engine="block")
fs = float(jnp.max(jnp.abs(f1)))
print("E rel diff", abs(float((e1 - e2) / e1)),
      "F maxdiff/scale", float(jnp.max(jnp.abs(f1 - f2))) / fs, flush=True)

for eng in [None, "block"]:
    def step(p, eng=eng):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap)
        e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                              0.4, 4.2, 1.8, engine=eng)
        return f
    t = measure(step, dep, (pos,), iters=3)
    print(f"D3 engine={eng}: {t*1e3:7.2f} ms", flush=True)
