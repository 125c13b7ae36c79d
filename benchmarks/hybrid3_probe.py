# SPDX-License-Identifier: Apache-2.0
"""Probe: hybrid-D3 full pipeline (the bench.py variant), focused.

hybrid2_probe's per-engine stencil sweep hung >40 min compiling the
explicit engine="pallas" stencil CN at 48^3/r=3; this probe measures only
what bench.py runs: grid_dftd3(engine="hybrid") with hybrid_cn in
{row, stencil} (default stencil engines), plus the xla full reference.
One probe process on the chip at a time.
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
from nvalchemiops_tpu.stencil import build_stencil_grid, choose_stencil_geometry

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = int(os.environ.get("HYBRID_PROBE_NREP", "48")), 3.0
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

dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n,
                                           target_occupancy=0.75)
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
geo = choose_stencil_geometry(pos, cell, pbc, cutoff)
sdims, sradius, sorigin, socc = geo
sorigin_j = None if not sorigin.any() else jnp.asarray(sorigin, jnp.float32)
print(f"N={n} dims={dims} cap={cap} stencil={sdims} r={sradius} occ={socc}",
      flush=True)


def run(hybrid_cn):
    def f(p):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        sg = build_stencil_grid(p, cell, pbc, sdims, sradius,
                                origin=sorigin_j)
        e, fo, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                               0.4, 4.2, 1.8, engine="hybrid", stencil=sg,
                               hybrid_cn=hybrid_cn)
        return fo
    t = measure(f, dep, (pos,), iters=3)
    print(f"hybrid full [{hybrid_cn:7s}] (incl builds): {t*1e3:7.2f} ms",
          flush=True)


run("row")
run("stencil")


def xla(p):
    gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
    e, fo, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                           0.4, 4.2, 1.8, engine="xla")
    return fo


t_x = measure(xla, dep, (pos,), iters=3)
print(f"xla full (incl gb) : {t_x*1e3:7.2f} ms", flush=True)
print("done", flush=True)
