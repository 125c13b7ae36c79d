# SPDX-License-Identifier: Apache-2.0
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import estimate_grid_geometry, build_atom_grid, grid_neighbor_count
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

dep = perturb_positions()
rng = np.random.default_rng(0)
zmax = 16
rcov = jnp.asarray(np.r_[0, rng.uniform(.6,1.2,zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0, rng.uniform(2,5,zmax)], jnp.float32)
cna = jnp.asarray(np.vstack([np.zeros(5), np.cumsum(rng.uniform(.3,1,(zmax,5)),1)]), jnp.float32)
c6 = rng.uniform(5,40,(zmax+1,zmax+1,5,5)); c6[0]=0; c6[:,0]=0
c6 = 0.5*(c6 + np.swapaxes(np.swapaxes(c6,0,1),2,3))
c6 = jnp.asarray(c6, jnp.float32)

def crystal(n_rep, a=3.0):
    g = np.stack(np.meshgrid(*([np.arange(n_rep)]*3), indexing="ij"), -1).reshape(-1,3)*a
    return g + rng.uniform(-0.2, 0.2, g.shape), np.eye(3)*(n_rep*a)

for n_rep, cutoff in [(32, 9.0), (46, 9.0)]:
    posn, celln = crystal(n_rep)
    N = posn.shape[0]
    pos = jnp.asarray(posn, jnp.float32); cell = jnp.asarray(celln, jnp.float32)
    pbc = np.array([True]*3)
    numbers = jnp.asarray(rng.integers(1, zmax+1, N), jnp.int32)
    dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, N, target_occupancy=0.6)
    g = build_atom_grid(pos, cell, pbc, dims, radius, cap)
    npairs = int(jnp.sum(grid_neighbor_count(g, cutoff, N)))
    print(f"N={N} dims={dims} radius={radius} cap={cap} occ={int(g.counts_max)} pairs={npairs}", flush=True)

    def d3_step(p):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap)
        e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8)
        return f
    t = measure(d3_step, dep, (pos,), iters=3)
    print(f"  grid D3 (build+E+F+CN): {t*1e3:.2f}ms = {t*1e6/N:.3f}us/atom "
          f"[ref 31k/35.6M pairs: 6.7ms; 85k/97.6M: 16.5ms]", flush=True)
