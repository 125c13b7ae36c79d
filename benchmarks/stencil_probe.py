# SPDX-License-Identifier: Apache-2.0
"""Probe: voxel-stencil sweep vs the capacity-padded row sweep at 110k.

Decisive measurement for the stencil engine (stencil.py): Coulomb E+F on
the bench crystal (48^3 sc lattice, 9 A cutoff) through both traversals,
plus the stencil/grid build costs and a CN-only pass to split grid-D3 by
pass.  One probe process at a time on the chip.
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
    grid_coulomb_energy_forces, grid_coordination_numbers,
)
from nvalchemiops_tpu.stencil import (
    build_stencil_grid, choose_stencil_geometry, stencil_coulomb_energy_forces,
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
charges = jnp.asarray(rng.normal(size=n), jnp.float32)
rcov_a = jnp.asarray(rng.uniform(0.6, 1.2, n), jnp.float32)

# --- row grid (tuned bench recipe) -----------------------------------------
dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n,
                                           target_occupancy=0.75)
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
print(f"N={n} grid dims={dims} cap={cap}", flush=True)

# --- stencil geometry ------------------------------------------------------
geo = choose_stencil_geometry(pos, cell, pbc, cutoff)
print("stencil geometry:", geo[:2], "origin", geo[2], "occ", geo[3], flush=True)
sdims, sradius, sorigin, _ = geo
sorigin_j = None if not sorigin.any() else jnp.asarray(sorigin, jnp.float32)


def gbuild(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


def sbuild(p):
    return build_stencil_grid(p, cell, pbc, sdims, sradius, origin=sorigin_j)


t_gbuild = measure(lambda p: gbuild(p).ext_px, dep, (pos,), iters=8)
print(f"grid build        : {t_gbuild*1e3:8.2f} ms", flush=True)
t_sbuild = measure(lambda p: sbuild(p).ext_px, dep, (pos,), iters=8)
print(f"stencil build     : {t_sbuild*1e3:8.2f} ms", flush=True)


def g_coul(p):
    g = gbuild(p)
    e, f = grid_coulomb_energy_forces(g, charges, cutoff, alpha)
    return f

t = measure(g_coul, dep, (pos,), iters=4)
print(f"grid coulomb E+F  : {(t - t_gbuild)*1e3:8.2f} ms", flush=True)


def s_coul(p):
    sg = sbuild(p)
    e, f = stencil_coulomb_energy_forces(sg, charges, cutoff, alpha)
    return f

t = measure(s_coul, dep, (pos,), iters=4)
print(f"stencil coulomb   : {(t - t_sbuild)*1e3:8.2f} ms", flush=True)

# accuracy cross-check on chip
g = gbuild(pos)
sg = sbuild(pos)
e_g, f_g = grid_coulomb_energy_forces(g, charges, cutoff, alpha)
e_s, f_s = stencil_coulomb_energy_forces(sg, charges, cutoff, alpha)
de = float(jnp.max(jnp.abs(e_s - e_g)))
df = float(jnp.max(jnp.abs(f_s - f_g)))
print(f"on-chip stencil-vs-grid: dE {de:.3e}  dF {df:.3e}", flush=True)

# CN-only pass (pass-1 proxy for the D3 decomposition)
def g_cn(p):
    g2 = gbuild(p)
    return grid_coordination_numbers(g2, rcov_a, cutoff)

t = measure(g_cn, dep, (pos,), iters=4)
print(f"grid CN pass      : {(t - t_gbuild)*1e3:8.2f} ms", flush=True)

from nvalchemiops_tpu.stencil import stencil_coordination_numbers


def s_cn(p):
    sg2 = sbuild(p)
    return stencil_coordination_numbers(sg2, rcov_a, cutoff)

t = measure(s_cn, dep, (pos,), iters=4)
print(f"stencil CN pass   : {(t - t_sbuild)*1e3:8.2f} ms", flush=True)

# full D3: xla engine vs hybrid (stencil CN/chain + row interp pass)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

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


def d3_xla(p):
    g2 = gbuild(p)
    _, f, _ = grid_dftd3(g2, numbers, rcov_t, r4r2_t, c6_t, cna_t,
                         cutoff, 0.4, 4.2, 1.8, engine="xla")
    return f

t = measure(d3_xla, dep, (pos,), iters=3)
print(f"D3 xla (3 passes) : {(t - t_gbuild)*1e3:8.2f} ms", flush=True)


def d3_hybrid(p):
    g2 = gbuild(p)
    sg2 = sbuild(p)
    _, f, _ = grid_dftd3(g2, numbers, rcov_t, r4r2_t, c6_t, cna_t,
                         cutoff, 0.4, 4.2, 1.8, stencil=sg2)
    return f

t = measure(d3_hybrid, dep, (pos,), iters=3)
print(f"D3 hybrid         : {(t - t_gbuild - t_sbuild)*1e3:8.2f} ms", flush=True)

# on-chip hybrid accuracy
g1 = gbuild(pos)
sg1 = sbuild(pos)
e_x, f_x, cn_x = grid_dftd3(g1, numbers, rcov_t, r4r2_t, c6_t, cna_t,
                            cutoff, 0.4, 4.2, 1.8, engine="xla")
e_h, f_h, cn_h = grid_dftd3(g1, numbers, rcov_t, r4r2_t, c6_t, cna_t,
                            cutoff, 0.4, 4.2, 1.8, stencil=sg1)
print(f"hybrid-vs-xla: dE_rel {abs(float(e_h-e_x))/abs(float(e_x)):.3e} "
      f"dF {float(jnp.max(jnp.abs(f_h-f_x))):.3e} "
      f"dCN {float(jnp.max(jnp.abs(cn_h-cn_x))):.3e}", flush=True)
print("done", flush=True)
