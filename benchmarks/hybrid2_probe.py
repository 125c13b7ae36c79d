# SPDX-License-Identifier: Apache-2.0
"""Probe: the hybrid-D3 stages hybrid_probe.py timed out before measuring.

Round-1 chip data (probe_hybrid_probe.log, N=110592, 9 A, dims 16^3 cap 32):
grid build 1.81 / stencil build 0.86 / stencil CN (incl sb) 4.77 /
row p1+p2 11.70 / row p2-only 13.05 ms.  Missing: stencil chain, per-engine
stencil CN/chain, full hybrid through grid_dftd3, manual hybrid assembly.
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
    gather_from_grid,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3
from nvalchemiops_tpu.stencil import (
    build_stencil_grid, choose_stencil_geometry,
    stencil_cn_chain_forces, stencil_coordination_numbers,
)

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

rcov_a = rcov[numbers]
A1, A2, S6, S8, K1, K3 = 0.4, 4.2, 1.0, 1.8, 16.0, -4.0


def gbuild(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


def sbuild(p):
    return build_stencil_grid(p, cell, pbc, sdims, sradius, origin=sorigin_j)


decn_a = jnp.asarray(rng.normal(size=n), jnp.float32)


def stage_chain(p):
    sg = sbuild(p)
    return stencil_cn_chain_forces(sg, rcov_a, decn_a, cutoff, K1)


t = measure(stage_chain, dep, (pos,), iters=3)
print(f"stencil chain (incl sb): {t*1e3:7.2f} ms", flush=True)

for eng in ("pallas", "stack", "fuse", "xla"):
    def cn_eng(p, e=eng):
        sg = sbuild(p)
        return stencil_coordination_numbers(sg, rcov_a, cutoff, K1, engine=e)

    def chain_eng(p, e=eng):
        sg = sbuild(p)
        return stencil_cn_chain_forces(sg, rcov_a, decn_a, cutoff, K1,
                                       engine=e)

    try:
        t1 = measure(cn_eng, dep, (pos,), iters=3)
        t2 = measure(chain_eng, dep, (pos,), iters=3)
        print(f"stencil CN/chain [{eng:6s}]: {t1*1e3:7.2f} / {t2*1e3:7.2f} ms",
              flush=True)
    except Exception as exc:
        print(f"stencil CN/chain [{eng:6s}]: failed {type(exc).__name__}",
              flush=True)


def hybrid(p):
    gg = gbuild(p)
    sg = sbuild(p)
    e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                          A1, A2, S8, s6=S6, engine="hybrid", stencil=sg)
    return f


t_h = measure(hybrid, dep, (pos,), iters=3)
print(f"hybrid full (incl builds): {t_h*1e3:7.2f} ms", flush=True)


def xla(p):
    gg = gbuild(p)
    e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                          A1, A2, S8, s6=S6, engine="xla")
    return f


t_x = measure(xla, dep, (pos,), iters=3)
print(f"xla full (incl gb) : {t_x*1e3:7.2f} ms", flush=True)
print("done", flush=True)
