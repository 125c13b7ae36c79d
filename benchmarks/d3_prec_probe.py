# SPDX-License-Identifier: Apache-2.0
"""Probe: D3 engine precision ladder vs XLA-HIGHEST ground truth."""
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

base = (g0, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8)
eh, fh, _ = grid_dftd3(*base, precision=jax.lax.Precision.HIGHEST)
fs = float(jnp.max(jnp.abs(fh)))

for label, kw in [
    ("xla default", {}),
    ("block HIGHEST dots", {"engine": "block"}),
]:
    e, f, _ = grid_dftd3(*base, **kw)
    print(f"{label:22s} vs xla-HIGHEST: E rel {abs(float((e-eh)/eh)):.2e} "
          f"F max/scale {float(jnp.max(jnp.abs(f-fh)))/fs:.2e}", flush=True)

def make_step(prec):
    def step(p):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap)
        e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                              0.4, 4.2, 1.8, precision=prec)
        return f
    return step
for label, prec in [("default", None),
                    ("HIGHEST", jax.lax.Precision.HIGHEST)]:
    t = measure(make_step(prec), dep, (pos,), iters=3)
    print(f"D3 xla {label}: {t*1e3:7.2f} ms", flush=True)
