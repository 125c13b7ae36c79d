# SPDX-License-Identifier: Apache-2.0
"""Probe: XLA FFT vs MXU matmul-DFT convolution in the PME pipelines.

Raw convolution roundtrips (rfftn * kernel -> irfftn vs
matmul_rfft_convolve) at the two bench shapes, then the full public
paths: batched windowed PME (64 x 2000, 32^3 — the matched config we
lose 9.9 vs 5.76 ms) and single-system 110k / 128^3 (the headline PME
stage).  One probe process on the chip at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.mathops.matmul_dft import matmul_rfft_convolve
from nvalchemiops_tpu.interactions.electrostatics.pme import (
    _pme_reciprocal_impl, batch_pme_reciprocal,
)
from nvalchemiops_tpu import spline_windowed as sw

dep = perturb_positions()
rng = np.random.default_rng(5)

# ---- raw convolution roundtrips --------------------------------------
for shape, label in (((64, 32, 32, 32), "64x32^3"), ((128, 128, 128), "128^3")):
    mesh = jnp.asarray(rng.normal(size=shape), jnp.float32)
    nx, ny, nz = shape[-3:]
    kern = jnp.asarray(rng.normal(size=(nx, ny, nz // 2 + 1)), jnp.float32)

    def f_xla(m):
        return jnp.fft.irfftn(
            jnp.fft.rfftn(m, norm="backward", axes=(-3, -2, -1)) * kern,
            s=(nx, ny, nz), norm="forward", axes=(-3, -2, -1))

    def f_mm(m):
        return matmul_rfft_convolve(m, kern)

    t_x = measure(f_xla, dep, (mesh,), iters=8)
    t_m = measure(f_mm, dep, (mesh,), iters=8)
    print(f"convolve {label}: xla {t_x*1e3:7.2f} ms | matmul {t_m*1e3:7.2f} ms",
          flush=True)

# ---- batched windowed PME (matched config) ---------------------------
B, npa, box = 64, 2000, 27.0
mesh_dims = (32, 32, 32)
pos_b = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q_b = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
cell = jnp.asarray(np.eye(3) * box, jnp.float32)
tile_cap = max(sw.observed_tile_capacity(pos_b[i], cell, mesh_dims)
               for i in range(B)) + 8

for forces in (False, True):
    for mode in ("xla", "matmul"):
        def full(p, f=forces, m=mode):
            out = batch_pme_reciprocal(p, q_b, cell, 0.35, mesh_dims,
                                       compute_forces=f, tile_capacity=tile_cap,
                                       fft_mode=m)
            return out[1] if f else out
        t = measure(full, dep, (pos_b,), iters=4)
        print(f"batch PME E{'+F' if forces else '  '} {mode:6s}: "
              f"{t*1e3:7.2f} ms", flush=True)

# ---- single-system headline shape ------------------------------------
n_rep, a = 48, 3.0
g = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"),
             -1).reshape(-1, 3) * a
pos = jnp.asarray(g + rng.uniform(-0.2, 0.2, g.shape), jnp.float32)
cell1 = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
q = jnp.asarray(rng.normal(size=pos.shape[0]), jnp.float32)
mesh128 = (128, 128, 128)
tc = sw.observed_tile_capacity(pos, cell1, mesh128)

for mode in ("xla", "matmul"):
    def pme_step(p, m=mode):
        _, forces, _ = _pme_reciprocal_impl(
            p, q, cell1.reshape(1, 3, 3), jnp.asarray([0.35], jnp.float32),
            mesh128, 4, None, True, False, None, None,
            tile_capacity=tc, fft_mode=m,
        )
        return forces
    t = measure(pme_step, dep, (pos,), iters=3)
    print(f"PME 110k/128^3 E+F {mode:6s}: {t*1e3:7.2f} ms", flush=True)
print("done", flush=True)
