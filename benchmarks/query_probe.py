# SPDX-License-Identifier: Apache-2.0
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

def timeit(fn, *args, iters=5):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters

N, M, cap, O, K = 32768, 343, 96, 27, 32
C = O * cap  # 2592... use realistic: cap=96? ref: 32k atoms in 7^3=343 cells -> 95/cell
rng = np.random.default_rng(0)
padded_cells = jnp.asarray(rng.integers(0, N, (M, cap)), jnp.int32)
lin = jnp.asarray(rng.integers(0, M, (N, O)), jnp.int32)
pos = jnp.asarray(rng.random((N, 3)), jnp.float32)

@jax.jit
def g1(lin, padded_cells):
    return padded_cells[lin]  # [N, O, cap]

cand = g1(lin, padded_cells)
print("gather cells [N,O]->[N,O,cap]:", timeit(g1, lin, padded_cells)*1e3, "ms", flush=True)

cand_flat = cand.reshape(N, O*cap)
@jax.jit
def g2(cand_flat, pos):
    return pos[cand_flat]  # [N, O*cap, 3]
print("gather pos [N,C]->[N,C,3]:", timeit(g2, cand_flat, pos)*1e3, "ms", flush=True)

@jax.jit
def g2b(cand_flat, pos):
    px = pos[:,0]; 
    return px[cand_flat]  # [N, C]
print("gather 1 component [N,C]:", timeit(g2b, cand_flat, pos)*1e3, "ms", flush=True)

@jax.jit
def g3(cand_flat, pos):
    px, py, pz = pos[:,0], pos[:,1], pos[:,2]
    dx = px[cand_flat] - px[:,None]
    dy = py[cand_flat] - py[:,None]
    dz = pz[cand_flat] - pz[:,None]
    d2 = dx*dx+dy*dy+dz*dz
    return jnp.sum(d2 < 0.1, axis=1)
print("gather+dist+count:", timeit(g3, cand_flat, pos)*1e3, "ms", flush=True)

keys = jnp.asarray(rng.integers(0, 100000, (N, O*cap)), jnp.int32)
@jax.jit
def g4(keys):
    return jax.lax.top_k(keys, K)[0]
print("top_k K=32 over", O*cap, ":", timeit(g4, keys)*1e3, "ms", flush=True)

@jax.jit
def g5(cand, p):
    return jnp.take_along_axis(cand, p, axis=1)
p = jnp.asarray(rng.integers(0, O*cap, (N, K)), jnp.int32)
print("take_along_axis [N,C]->[N,K]:", timeit(g5, keys, p)*1e3, "ms", flush=True)
