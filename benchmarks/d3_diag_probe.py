# SPDX-License-Identifier: Apache-2.0
"""Diagnose block-vs-xla D3 divergence: CN agreement, force-error stats."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from nvalchemiops_tpu.grid import estimate_grid_geometry, build_atom_grid
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

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
base = (g0, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8)

eh, fh, cnh = grid_dftd3(*base, precision=jax.lax.Precision.HIGHEST)
eb, fb, cnb = grid_dftd3(*base, engine="block")
fh_np, fb_np = np.asarray(fh), np.asarray(fb)
cn_d = float(jnp.max(jnp.abs(cnh - cnb)))
print("CN maxdiff:", cn_d, flush=True)
d = np.abs(fb_np - fh_np).max(1)
fs = np.abs(fh_np).max()
print("F err/scale percentiles 50/90/99/99.9/max:",
      [f"{np.percentile(d, p)/fs:.1e}" for p in (50, 90, 99, 99.9)],
      f"{d.max()/fs:.1e}", flush=True)
bad = np.argsort(d)[-5:]
print("worst atoms:", bad, "err", d[bad]/fs, flush=True)
print("their |f|:", np.abs(fh_np[bad]).max(1), "f scale:", fs, flush=True)
print("their cn diff:", np.asarray(jnp.abs(cnh - cnb))[bad], flush=True)
