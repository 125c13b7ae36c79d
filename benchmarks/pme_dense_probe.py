# SPDX-License-Identifier: Apache-2.0
"""Probe: dense (tile-free) vs windowed batch PME at the matched config.

pme_batch_probe decomposed the windowed path at 64x2000/32^3 as
tile build 2.6 + spread 5.4 + fft 0.55 + gather 1.9 ms (E total 10.65,
H100 reference 5.76).  The dense engine replaces tiles + windows with
chunked separable matmuls over the whole 32^3 mesh — no tile build, no
capacity padding.  Bit-identical outputs (test_batch_pme.py).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.interactions.electrostatics.pme import batch_pme_reciprocal

dep = perturb_positions()
rng = np.random.default_rng(11)
B, npa, box = 64, 2000, 27.0
mesh = (32, 32, 32)
pos = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
q = q - q.mean(axis=1, keepdims=True)
cell = jnp.asarray(np.eye(3) * box, jnp.float32)
print(f"B={B} npa={npa} mesh={mesh}", flush=True)

for engine in ("windowed", "dense"):
    for fft_mode in ("xla", "matmul"):
        t = measure(
            lambda p: batch_pme_reciprocal(
                p, q, cell, 0.4, mesh, engine=engine, fft_mode=fft_mode),
            dep, (pos,), iters=4)
        print(f"E   {engine:9s}/{fft_mode:6s}: {t*1e3:8.2f} ms", flush=True)
        tf = measure(
            lambda p: batch_pme_reciprocal(
                p, q, cell, 0.4, mesh, engine=engine, fft_mode=fft_mode,
                compute_forces=True)[1],
            dep, (pos,), iters=4)
        print(f"E+F {engine:9s}/{fft_mode:6s}: {tf*1e3:8.2f} ms", flush=True)
print("done", flush=True)
