# SPDX-License-Identifier: Apache-2.0
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (estimate_grid_geometry, build_atom_grid,
    grid_coulomb_energy_forces, grid_coordination_numbers, grid_neighbor_count)

dep = perturb_positions()

def crystal(n_rep, a=3.0):
    g = np.stack(np.meshgrid(*([np.arange(n_rep)]*3), indexing="ij"), -1).reshape(-1,3)*a
    rng = np.random.default_rng(0)
    return g + rng.uniform(-0.2, 0.2, g.shape), np.eye(3)*(n_rep*a)

for n_rep, cutoff in [(32, 4.5), (46, 4.5)]:
    posn, celln = crystal(n_rep)
    N = posn.shape[0]
    pos = jnp.asarray(posn, jnp.float32); cell = jnp.asarray(celln, jnp.float32)
    pbc = np.array([True]*3)
    dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, N, target_occupancy=0.5)
    print(f"N={N} dims={dims} radius={radius} cap={cap}", flush=True)

    t_build = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap).ext_px,
                      dep, (pos,), iters=8)
    print(f"  build: {t_build*1e3:.3f}ms", flush=True)

    g = build_atom_grid(pos, cell, pbc, dims, radius, cap)
    print(f"  occupancy max {int(g.counts_max)}/{cap}", flush=True)

    q = jnp.asarray(np.random.default_rng(1).normal(size=N), jnp.float32)
    def coulomb_step(p):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap)
        e, f = grid_coulomb_energy_forces(gg, q, cutoff, 0.35)
        return e
    t_coul = measure(coulomb_step, dep, (pos,), iters=4)
    print(f"  build+coulomb(E,F): {t_coul*1e3:.3f}ms = {t_coul*1e6/N:.3f}us/atom", flush=True)

    def count_step(p):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap)
        return grid_neighbor_count(gg, cutoff, N)
    t_cnt = measure(count_step, dep, (pos,), iters=4)
    print(f"  build+count (NL equiv): {t_cnt*1e3:.3f}ms [ref cell-list 32k: 0.878ms, 131k: 6.71ms]", flush=True)

# PME with separable matmul path
from nvalchemiops_tpu.interactions.electrostatics.pme import _pme_reciprocal_impl
posn, celln = crystal(46)
N = posn.shape[0]
pos = jnp.asarray(posn, jnp.float32); cell = jnp.asarray(celln, jnp.float32).reshape(1,3,3)
q = jnp.asarray(np.random.default_rng(1).normal(size=N), jnp.float32)
for mesh in [(64,64,64), (128,128,128)]:
    t = measure(lambda p: _pme_reciprocal_impl(p, q, cell, jnp.asarray([0.3], jnp.float32),
                mesh, 4, None, False, False, None, None)[0], dep, (pos,), iters=4)
    print(f"PME recip {mesh[0]}^3 N={N}: {t*1e3:.3f}ms = {t*1e6/N:.3f}us/atom [ref 16k: 0.774ms]", flush=True)
    t = measure(lambda p: _pme_reciprocal_impl(p, q, cell, jnp.asarray([0.3], jnp.float32),
                mesh, 4, None, True, False, None, None)[1], dep, (pos,), iters=4)
    print(f"PME recip+forces {mesh[0]}^3: {t*1e3:.3f}ms", flush=True)
