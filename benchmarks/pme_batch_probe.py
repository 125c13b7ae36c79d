# SPDX-License-Identifier: Apache-2.0
"""Probe: stage decomposition of the batched windowed PME (64 x 2000).

The matched-config gap vs the reference (H100 5.76 ms) is 9.9 ms E-only /
~15-16 ms E+F — this probe splits the vmapped pipeline into tile build /
spread / FFT roundtrip / gather / force epilogue to find where the batch
path spends, and sweeps the tile capacity.  One probe process on the chip
at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu import spline_windowed as sw
from nvalchemiops_tpu.interactions.electrostatics.k_vectors import (
    generate_k_vectors_pme,
)
from nvalchemiops_tpu.interactions.electrostatics.pme import (
    batch_pme_reciprocal, pme_green_structure_factor,
)

dep = perturb_positions()
rng = np.random.default_rng(5)
B, npa, box = 64, 2000, 27.0
mesh_dims = (32, 32, 32)
alpha = 0.35
order = 4

pos_b = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q_b = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
cell = jnp.asarray(np.eye(3) * box, jnp.float32)

tile_cap = max(sw.observed_tile_capacity(pos_b[i], cell, mesh_dims)
               for i in range(B)) + 8
print(f"B={B} npa={npa} mesh={mesh_dims} tile_cap={tile_cap}", flush=True)


def vm(fn):
    return jax.vmap(fn)


def tiles_of(p, need_grad):
    return sw.build_mesh_tiles(p, cell, mesh_dims, order, tile_cap,
                               need_grad=need_grad)


# stage: tile build
t = measure(vm(lambda p: tiles_of(p, False).smat), dep, (pos_b,), iters=4)
print(f"tile build        : {t*1e3:7.2f} ms", flush=True)
t = measure(vm(lambda p: tiles_of(p, True).smat), dep, (pos_b,), iters=4)
print(f"tile build (grad) : {t*1e3:7.2f} ms", flush=True)


# stage: build + spread
def spread_fn(p, q):
    return sw.windowed_spread(tiles_of(p, False), q)

t = measure(lambda p: vm(spread_fn)(p, q_b), dep, (pos_b,), iters=4)
print(f"build+spread      : {t*1e3:7.2f} ms", flush=True)


# stage: + fft roundtrip
_, k_squared = generate_k_vectors_pme(cell, mesh_dims)
green, sf_sq = pme_green_structure_factor(k_squared, mesh_dims, alpha, cell,
                                          order)


def pot_fn(p, q):
    mesh = sw.windowed_spread(tiles_of(p, False), q)
    mf = jnp.fft.rfftn(mesh, norm="backward")
    return jnp.fft.irfftn(mf / sf_sq * green, s=mesh_dims,
                          norm="forward").astype(jnp.float32)

t = measure(lambda p: vm(pot_fn)(p, q_b), dep, (pos_b,), iters=4)
print(f"build+spread+fft  : {t*1e3:7.2f} ms", flush=True)


# stage: + gather (energy path)
def e_fn(p, q):
    tiles = tiles_of(p, False)
    mesh = sw.windowed_spread(tiles, q)
    mf = jnp.fft.rfftn(mesh, norm="backward")
    pot = jnp.fft.irfftn(mf / sf_sq * green, s=mesh_dims,
                         norm="forward").astype(jnp.float32)
    return q * sw.windowed_gather(tiles, pot)

t = measure(lambda p: vm(e_fn)(p, q_b), dep, (pos_b,), iters=4)
print(f"+gather (E path)  : {t*1e3:7.2f} ms", flush=True)


# full public paths
for forces in (False, True):
    def full(p, f=forces):
        out = batch_pme_reciprocal(p, q_b, cell, alpha, mesh_dims,
                                   compute_forces=f, tile_capacity=tile_cap)
        return out[1] if f else out
    t = measure(full, dep, (pos_b,), iters=4)
    print(f"full E{'+F' if forces else '  '} public  : {t*1e3:7.2f} ms",
          flush=True)

# capacity sweep on the full E+F path
for cap_try in (tile_cap, 8 * ((tile_cap - 8) // 8) or 8,
                8 * ((tile_cap + 16) // 8)):
    def full_c(p, c=cap_try):
        return batch_pme_reciprocal(p, q_b, cell, alpha, mesh_dims,
                                    compute_forces=True, tile_capacity=c)[1]
    try:
        t = measure(full_c, dep, (pos_b,), iters=4)
        print(f"E+F cap={cap_try:3d}     : {t*1e3:7.2f} ms", flush=True)
    except Exception as exc:  # cap too small -> build-time check may throw
        print(f"E+F cap={cap_try:3d}     : failed ({type(exc).__name__})",
              flush=True)

# dense (tile-free separable) engine — no tile build, no capacity padding
for forces in (False, True):
    for fft_mode in ("auto", "xla"):
        def dense_fn(p, f=forces, fm=fft_mode):
            out = batch_pme_reciprocal(p, q_b, cell, alpha, mesh_dims,
                                       compute_forces=f, engine="dense",
                                       fft_mode=fm)
            return out[1] if f else out
        try:
            t = measure(dense_fn, dep, (pos_b,), iters=4)
            print(f"dense E{'+F' if forces else '  '} fft={fft_mode:6s}: "
                  f"{t*1e3:7.2f} ms", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"dense E{'+F' if forces else '  '} fft={fft_mode:6s}: "
                  f"failed {type(exc).__name__}: {exc}"[:300], flush=True)

# dense vs windowed parity
e_w, f_w = batch_pme_reciprocal(pos_b, q_b, cell, alpha, mesh_dims,
                                compute_forces=True, tile_capacity=tile_cap)
e_d, f_d = batch_pme_reciprocal(pos_b, q_b, cell, alpha, mesh_dims,
                                compute_forces=True, engine="dense")
scale = float(jnp.abs(f_w).max())
print(f"dense-vs-windowed E rel: "
      f"{float(jnp.abs(e_d - e_w).max() / jnp.abs(e_w).max()):.3e}",
      flush=True)
print(f"dense-vs-windowed F rel: {float(jnp.abs(f_d - f_w).max()) / scale:.3e}",
      flush=True)
print("done", flush=True)
