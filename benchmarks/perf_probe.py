# SPDX-License-Identifier: Apache-2.0
"""On-device timing probe for the hot paths (run on the TPU chip)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

def timeit(fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

def crystal(n_rep, a=3.0):
    g = np.stack(np.meshgrid(*([np.arange(n_rep)]*3), indexing="ij"), -1).reshape(-1,3)*a
    return g, np.eye(3)*(n_rep*a)

def main():
    from nvalchemiops_tpu.neighborlist.cell_list import (
        build_cell_list, query_cell_list_packed, estimate_cell_list_sizes)
    n_rep = 32
    posn, celln = crystal(n_rep)
    pos = jnp.asarray(posn, jnp.float32); cell = jnp.asarray(celln, jnp.float32)
    pbc = np.array([True]*3)
    cutoff = 4.5
    mc, radius = estimate_cell_list_sizes(cell, pbc, cutoff)
    rt = tuple(int(v) for v in np.asarray(radius))
    N = pos.shape[0]

    t_build = timeit(lambda: build_cell_list(pos, cutoff, cell, pbc, mc))
    cl = build_cell_list(pos, cutoff, cell, pbc, mc)
    cap = int(np.ceil(int(jnp.max(cl.atoms_per_cell_count))/8))*8
    t_query = timeit(lambda: query_cell_list_packed(pos, cutoff, cell, pbc, cl, rt, cap, 32, fill_value=N))
    print(f"N={N} cell-list: build={t_build*1e3:.2f}ms query={t_query*1e3:.2f}ms "
          f"total={(t_build+t_query)*1e6/N:.3f}us/atom  [ref 32k: 0.878ms]", flush=True)

    nm, num, shp = query_cell_list_packed(pos, cutoff, cell, pbc, cl, rt, cap, 32, fill_value=N)
    from nvalchemiops_tpu.interactions.dispersion._kernels import dftd3_matrix_kernel
    rng = np.random.default_rng(0); Z = 16
    c6 = rng.uniform(5,20,(Z+1,Z+1,5,5)).astype(np.float32)
    cnr = np.cumsum(rng.uniform(.3,1,(Z+1,Z+1,5,5)),2).astype(np.float32)
    numbers = jnp.asarray(rng.integers(1,Z+1,N), jnp.int32)
    args = (pos, numbers, nm, shp, cell.reshape(1,3,3), None,
            jnp.asarray(np.r_[0, rng.uniform(.6,1.2,Z)], jnp.float32),
            jnp.asarray(np.r_[0, rng.uniform(2,5,Z)], jnp.float32),
            jnp.asarray(c6), jnp.asarray(cnr),
            jnp.float32(.4), jnp.float32(4.2), jnp.float32(1.8), jnp.float32(16.), jnp.float32(-4.),
            jnp.float32(1.), jnp.float32(1e10), jnp.float32(1e10))
    t_d3 = timeit(lambda: dftd3_matrix_kernel(*args, fill_value=N, periodic=True,
                  num_systems=1, compute_virial=False))
    npairs = int(jnp.sum(num))
    print(f"D3 K=32: {t_d3*1e3:.2f}ms pairs={npairs} {t_d3*1e6/N:.3f}us/atom", flush=True)

    # realistic D3: cutoff 9.0 (a=3) -> ~113 pairs/atom at rho=1/27
    cutoff2 = 12.0
    mc2, radius2 = estimate_cell_list_sizes(cell, pbc, cutoff2)
    rt2 = tuple(int(v) for v in np.asarray(radius2))
    cl2 = build_cell_list(pos, cutoff2, cell, pbc, mc2)
    cap2 = int(np.ceil(int(jnp.max(cl2.atoms_per_cell_count))/8))*8
    t_q2 = timeit(lambda: query_cell_list_packed(pos, cutoff2, cell, pbc, cl2, rt2, cap2, 288, fill_value=N))
    nm2, num2, shp2 = query_cell_list_packed(pos, cutoff2, cell, pbc, cl2, rt2, cap2, 288, fill_value=N)
    print(f"NL cutoff12: query={t_q2*1e3:.2f}ms cap={cap2} maxnb={int(num2.max())}", flush=True)
    args2 = (pos, numbers, nm2, shp2) + args[4:]
    t_d32 = timeit(lambda: dftd3_matrix_kernel(*args2, fill_value=N, periodic=True,
                   num_systems=1, compute_virial=False))
    npairs2 = int(jnp.sum(num2))
    print(f"D3 K=288: {t_d32*1e3:.2f}ms pairs={npairs2} {t_d32*1e6/N:.3f}us/atom [ref 31k/35.6M: 6.7ms]", flush=True)

    from nvalchemiops_tpu.interactions.electrostatics.pme import _pme_reciprocal_impl
    q = jnp.asarray(rng.normal(size=N), jnp.float32)
    t_pme = timeit(lambda: _pme_reciprocal_impl(
        pos, q, cell.reshape(1,3,3), jnp.asarray([0.35], jnp.float32), (64,64,64), 4,
        None, False, False, None, None))
    print(f"PME recip 64^3: {t_pme*1e3:.2f}ms {t_pme*1e6/N:.3f}us/atom [ref 16k: 0.774ms]", flush=True)
    t_pme_f = timeit(lambda: _pme_reciprocal_impl(
        pos, q, cell.reshape(1,3,3), jnp.asarray([0.35], jnp.float32), (64,64,64), 4,
        None, True, False, None, None))
    print(f"PME recip+forces: {t_pme_f*1e3:.2f}ms", flush=True)

main()
