# SPDX-License-Identifier: Apache-2.0
"""Probe: triangle-block Pallas dense D3 vs the XLA dense planes.

Matched reference config (H100 46.0 ms): 128 x 2000-atom CsCl boxes,
21.2 A cutoff on 41.2 A cells (two-image sweep, 4 pruned combos).
Tables are compacted to the present elements (compact_d3_elements), as an
MD caller would.  Also measures the 9 A minimum-image row for context and
checks force parity between the engines.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from nvalchemiops_tpu.interactions.dispersion.dense_d3 import (  # noqa: E402
    batch_dense_dftd3,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements,
)

dep = perturb_positions()
rng = np.random.default_rng(0)

B, nrep = int(os.environ.get("PROBE_B", "128")), 10
a_cscl = 4.123
base = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
frac = np.concatenate([
    (base + np.array([i, j, k])) / nrep
    for i in range(nrep) for j in range(nrep) for k in range(nrep)
])
box = a_cscl * nrep
cell = jnp.asarray(np.eye(3) * box, jnp.float32)
n = 2 * nrep ** 3
pos = jnp.asarray(frac[None] * box + rng.uniform(-0.1, 0.1, (B, n, 3)),
                  jnp.float32)
numbers_np = np.tile(np.tile([55, 17], nrep ** 3), (B, 1)).astype(np.int32)
zmax = 94
rcov_np = np.r_[0.0, rng.uniform(1.2, 2.4, zmax)]
r4r2_np = np.r_[0.0, rng.uniform(2.0, 8.0, zmax)]
cna_np = np.vstack([np.zeros(5),
                    np.cumsum(rng.uniform(0.4, 2.2, (zmax, 5)), 1)])
c6_np = rng.uniform(100.0, 1500.0, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0.0
c6_np[:, 0] = 0.0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
numbers, rcov, r4r2, c6, cna = compact_d3_elements(
    numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
numbers = jnp.asarray(numbers)
rcov, r4r2, c6, cna = (jnp.asarray(a, jnp.float32)
                       for a in (rcov, r4r2, c6, cna))
print(f"B={B} n={n} box={box:.1f} zm={rcov.shape[0]}", flush=True)

params = dict(a1=0.4289, a2=4.4407, s8=0.7875)
do_timing = os.environ.get("PROBE_TIMING", "1") == "1"
for cut, img in ((21.2, True), (9.0, False)) if do_timing else ():
    for eng, kw in (("xla", {}), ("pallas", dict(block=256)),
                    ("pallas", dict(block=128))):
        def d3f(p, c=cut, im=img, eng=eng, kw=kw):
            e, f, cn = batch_dense_dftd3(
                p, numbers, cell, c, rcov, r4r2, c6, cna,
                params["a1"], params["a2"], params["s8"], images=im,
                engine=eng, **kw)
            return e, f
        label = f"{eng}{'/' + str(kw['block']) if kw else ''}"
        try:
            t = measure(d3f, dep, (pos,), iters=2)
            print(f"batch D3 cutoff={cut:5.1f} images={img} "
                  f"{label:11s}: {t*1e3:8.2f} ms", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"batch D3 cutoff={cut} images={img} {label}: failed "
                  f"{type(exc).__name__}: {exc}"[:500], flush=True)

# parity at the matched config (both proven blocks; 256 is the round-4
# default, its whole-accumulator compile was the round-3 failure mode)
e_x, f_x, cn_x = batch_dense_dftd3(
    pos, numbers, cell, 21.2, rcov, r4r2, c6, cna, **params, images=True,
    engine="xla")
scale = float(jnp.abs(f_x).max())
for blk in (128, 256):
    e_p, f_p, cn_p = batch_dense_dftd3(
        pos, numbers, cell, 21.2, rcov, r4r2, c6, cna, **params,
        images=True, engine="pallas", block=blk)
    print(f"block {blk}: energy rel "
          f"{float(jnp.abs(e_p - e_x).max() / jnp.abs(e_x).max()):.3e}  "
          f"force rel {float(jnp.abs(f_p - f_x).max()) / scale:.3e}  "
          f"cn abs {float(jnp.abs(cn_p - cn_x).max()):.3e}", flush=True)
print("done", flush=True)
