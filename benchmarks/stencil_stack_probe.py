# SPDX-License-Identifier: Apache-2.0
"""Probe: stacked full-space stencil sweep vs row sweep at 110k atoms.

Times the stack engines (coulomb / CN / chain) against the row-sweep
equivalents, group-size variants, then full hybrid D3 vs xla.
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
    build_stencil_grid, choose_stencil_geometry,
    stencil_coulomb_energy_forces, stencil_coordination_numbers,
    stencil_cn_chain_forces, stencil_sweep_fullspace_stack,
    scatter_to_stencil, extend_stencil, own_flat_from_interior,
)
from nvalchemiops_tpu.pallas import stencil_sweep as ss
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
assert geo is not None, "no commensurate stencil geometry"
sdims, srad, sorigin, socc = geo
sorigin = sorigin if sorigin.any() else None
print(f"N={n} grid dims={dims} cap={cap}; stencil {sdims} r={srad}",
      flush=True)

grid = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)
sgrid = build_stencil_grid(pos, cell, pbc, sdims, srad, origin=sorigin)


def build_g(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


def build_s(p):
    return build_stencil_grid(p, cell, pbc, sdims, srad, origin=sorigin)


t_bg = measure(lambda p: build_g(p).ext_px, dep, (pos,), iters=6)
t_bs = measure(lambda p: build_s(p).ext_px, dep, (pos,), iters=6)
print(f"builds: grid {t_bg*1e3:.2f} ms, stencil {t_bs*1e3:.2f} ms",
      flush=True)

for name, fn in [
    ("coulomb row  ", lambda p: grid_coulomb_energy_forces(
        build_g(p), charges, cutoff, alpha)[1]),
    ("coulomb stack", lambda p: stencil_coulomb_energy_forces(
        build_s(p), charges, cutoff, alpha, engine="stack")[1]),
    ("cn row       ", lambda p: grid_coordination_numbers(
        build_g(p), rcov_a, cutoff)),
    ("cn stack     ", lambda p: stencil_coordination_numbers(
        build_s(p), rcov_a, cutoff, engine="stack")),
    ("chain stack  ", lambda p: stencil_cn_chain_forces(
        build_s(p), rcov_a, decn_a, cutoff, engine="stack")),
]:
    t = measure(fn, dep, (pos,), iters=4)
    print(f"{name}: {t*1e3:.2f} ms (incl build)", flush=True)

# group-size variants on the coulomb body (fixed prebuilt stencil grid)
q_int = scatter_to_stencil(sgrid, charges)
q_ext = extend_stencil(sgrid, q_int, 0.0)
own_q = own_flat_from_interior(sgrid, q_int)
for group in (342, 171, 114, 57, 32):
    def fn(p, g=group):
        sgr = build_s(p)
        qi = scatter_to_stencil(sgr, charges)
        return stencil_sweep_fullspace_stack(
            sgr, (("q", extend_stencil(sgr, qi, 0.0)),),
            (("q", own_flat_from_interior(sgr, qi)),),
            ss.coulomb_body(cutoff, alpha), 4, group=g)[0]
    t = measure(fn, dep, (pos,), iters=4)
    print(f"coulomb stack group={group}: {t*1e3:.2f} ms (incl build)",
          flush=True)

# full D3: hybrid (stack stencil passes) vs xla
zmax = 16
numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
rcov = jnp.asarray(np.r_[0, rng.uniform(.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, zmax)], jnp.float32)
cna = jnp.asarray(np.vstack([np.zeros(5),
                             np.cumsum(rng.uniform(.3, 1, (zmax, 5)), 1)]),
                  jnp.float32)
c6_np = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0
c6_np[:, 0] = 0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, jnp.float32)

for name, eng in [("d3 xla   ", None), ("d3 hybrid", "hybrid")]:
    def fn(p, e=eng):
        gg = build_g(p)
        st = build_s(p) if e == "hybrid" else None
        _, f, _ = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                             0.4, 4.2, 1.8,
                             stencil=st)
        return f
    t = measure(fn, dep, (pos,), iters=3)
    print(f"{name}: {t*1e3:.2f} ms (incl builds)", flush=True)

print("done", flush=True)
