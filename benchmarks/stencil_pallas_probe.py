# SPDX-License-Identifier: Apache-2.0
"""Probe: VMEM-resident Mosaic stencil sweep vs row sweep at 110k.

Times the pallas full-space stencil engines (coulomb / CN / chain) against
the row-sweep equivalents, then full D3 hybrid-with-pallas vs xla.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    build_atom_grid, choose_grid_origin, estimate_grid_geometry,
    grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.stencil import (
    build_stencil_grid, choose_stencil_geometry,
    stencil_coulomb_energy_forces, stencil_coordination_numbers,
    stencil_cn_chain_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

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
charges = jnp.asarray(rng.normal(size=n), jnp.float32)
rcov_a = jnp.asarray(rng.uniform(0.6, 1.2, n), jnp.float32)
decn_a = jnp.asarray(rng.normal(size=n), jnp.float32)

dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n,
                                           target_occupancy=0.75)
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
geo = choose_stencil_geometry(pos, cell, pbc, cutoff)
sdims, sradius, sorigin, _ = geo
sorigin_j = None if not sorigin.any() else jnp.asarray(sorigin, jnp.float32)
print(f"N={n} grid dims={dims} cap={cap}; stencil {sdims} r={sradius}",
      flush=True)


def gbuild(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


def sbuild(p):
    return build_stencil_grid(p, cell, pbc, sdims, sradius, origin=sorigin_j)


t_gbuild = measure(lambda p: gbuild(p).ext_px, dep, (pos,), iters=8)
t_sbuild = measure(lambda p: sbuild(p).ext_px, dep, (pos,), iters=8)
print(f"builds: grid {t_gbuild*1e3:.2f} ms, stencil {t_sbuild*1e3:.2f} ms",
      flush=True)

for name, fn in [
    ("coulomb plas", lambda p: stencil_coulomb_energy_forces(
        sbuild(p), charges, cutoff, alpha, engine="pallas")[1]),
    ("coulomb grid", lambda p: grid_coulomb_energy_forces(
        gbuild(p), charges, cutoff, alpha)[1]),
    ("cn plas     ", lambda p: stencil_coordination_numbers(
        sbuild(p), rcov_a, cutoff, engine="pallas")),
    ("chain plas  ", lambda p: stencil_cn_chain_forces(
        sbuild(p), rcov_a, decn_a, cutoff, engine="pallas")),
]:
    t = measure(fn, dep, (pos,), iters=4)
    base = t_sbuild if "plas" in name else t_gbuild
    print(f"{name}: {(t-base)*1e3:8.2f} ms", flush=True)

zmax = 16
numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
rcov_t = jnp.asarray(np.r_[0, rng.uniform(.6, 1.2, zmax)], jnp.float32)
r4r2_t = jnp.asarray(np.r_[0, rng.uniform(2, 5, zmax)], jnp.float32)
cna_t = jnp.asarray(np.vstack([np.zeros(5),
                               np.cumsum(rng.uniform(.3, 1, (zmax, 5)), 1)]),
                    jnp.float32)
c6_np = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0
c6_np[:, 0] = 0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6_t = jnp.asarray(c6_np, jnp.float32)


def d3_hybrid(p):
    _, f, _ = grid_dftd3(gbuild(p), numbers, rcov_t, r4r2_t, c6_t, cna_t,
                         cutoff, 0.4, 4.2, 1.8, stencil=sbuild(p))
    return f

t = measure(d3_hybrid, dep, (pos,), iters=3)
print(f"D3 hybrid(pallas): {(t - t_gbuild - t_sbuild)*1e3:8.2f} ms", flush=True)

g1, sg1 = gbuild(pos), sbuild(pos)
e_x, f_x, cn_x = grid_dftd3(g1, numbers, rcov_t, r4r2_t, c6_t, cna_t,
                            cutoff, 0.4, 4.2, 1.8, engine="xla")
e_h, f_h, cn_h = grid_dftd3(g1, numbers, rcov_t, r4r2_t, c6_t, cna_t,
                            cutoff, 0.4, 4.2, 1.8, stencil=sg1)
print(f"hybrid-vs-xla: dE_rel {abs(float(e_h-e_x))/abs(float(e_x)):.3e} "
      f"dF {float(jnp.max(jnp.abs(f_h-f_x))):.3e} "
      f"dCN {float(jnp.max(jnp.abs(cn_h-cn_x))):.3e}", flush=True)
e_gc, f_gc = grid_coulomb_energy_forces(g1, charges, cutoff, alpha)
e_sc, f_sc = stencil_coulomb_energy_forces(sg1, charges, cutoff, alpha,
                                           engine="pallas")
print(f"coulomb plas-vs-grid: dE {float(jnp.max(jnp.abs(e_sc-e_gc))):.3e} "
      f"dF {float(jnp.max(jnp.abs(f_sc-f_gc))):.3e}", flush=True)
print("done", flush=True)
