# SPDX-License-Identifier: Apache-2.0
"""Probe: batched PME dense engine + batched D3 at the matched 21.2 A config.

Round-1 state: batch PME (windowed) 10.8 E / 14.5 E+F ms at 64x2000/32^3 vs
H100 5.76; batch D3 measured only at 9 A (46.9 ms) vs the reference's
21.2 A (46.0 ms).  This probe measures (a) the tile-free dense PME engine
(never chip-measured), (b) the image-extended dense D3 at the reference's
CsCl supercell-10 x128 config.  One probe process on the chip at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions

dep = perturb_positions()
rng = np.random.default_rng(0)

# ---- batch PME: 64 x 2000 random boxes, 32^3 mesh -------------------------
from nvalchemiops_tpu.interactions.electrostatics.pme import (  # noqa: E402
    batch_pme_reciprocal,
)

B, npa, box = 64, 2000, 26.0
mesh = (32, 32, 32)
pos_b = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q_b = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
q_b = q_b - q_b.mean(axis=1, keepdims=True)
cell_b = jnp.asarray(np.eye(3) * box, jnp.float32)
alpha = 0.35

for eng in ("dense", "windowed"):
    for forces in (False, True):
        for fft in ("xla", "matmul"):
            def f(p, e=eng, fo=forces, fm=fft):
                out = batch_pme_reciprocal(
                    p, q_b, cell_b, alpha, mesh, compute_forces=fo,
                    engine=e, fft_mode=fm)
                return out[1] if fo else out
            try:
                t = measure(f, dep, (pos_b,), iters=3)
                print(f"batch PME {eng:8s} {'E+F' if forces else 'E  '} "
                      f"fft={fft:6s}: {t*1e3:7.2f} ms", flush=True)
            except Exception as exc:
                print(f"batch PME {eng} F={forces} fft={fft}: "
                      f"failed {type(exc).__name__}: {exc}", flush=True)

# ---- batch D3 at the reference's 21.2 A config ----------------------------
from nvalchemiops_tpu.interactions.dispersion.dense_d3 import (  # noqa: E402
    batch_dense_dftd3,
)

B3, nrep = 128, 10
a_cscl = 4.123  # Angstrom, CsCl conventional cell
base = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
frac = np.concatenate([
    (base + np.array([i, j, k])) / nrep
    for i in range(nrep) for j in range(nrep) for k in range(nrep)
])
box3 = a_cscl * nrep
cell3 = jnp.asarray(np.eye(3) * box3, jnp.float32)
pos_one = frac * box3
pos3 = jnp.asarray(
    pos_one[None] + rng.uniform(-0.1, 0.1, (B3, 2 * nrep**3, 3)),
    jnp.float32)
numbers3 = jnp.asarray(
    np.tile(np.tile([55, 17], nrep**3), (B3, 1)).astype(np.int32))
zmax = 94
rcov = jnp.asarray(np.r_[0.0, rng.uniform(0.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0.0, rng.uniform(2.0, 5.0, zmax)], jnp.float32)
cna = jnp.asarray(
    np.vstack([np.zeros(5), np.cumsum(rng.uniform(0.3, 1.0, (zmax, 5)), 1)]),
    jnp.float32)
c6_np = rng.uniform(5.0, 40.0, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0.0
c6_np[:, 0] = 0.0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, jnp.float32)

print(f"D3 config: B={B3} n={2*nrep**3} box={box3:.1f} cutoff=21.2 "
      f"(ratio {21.2/box3:.3f})", flush=True)

for cut, img in ((21.2, True), (21.2, False), (9.0, False)):
    def d3f(p, c=cut, im=img):
        e, f, cn = batch_dense_dftd3(
            p, numbers3, cell3, c, rcov, r4r2, c6, cna,
            0.4289, 4.4407, 0.7875, images=im)
        return f
    try:
        t = measure(d3f, dep, (pos3,), iters=2)
        print(f"batch D3 cutoff={cut:5.1f} images={img}: {t*1e3:8.2f} ms",
              flush=True)
    except Exception as exc:
        print(f"batch D3 cutoff={cut} images={img}: failed "
              f"{type(exc).__name__}: {exc}", flush=True)
print("done", flush=True)
