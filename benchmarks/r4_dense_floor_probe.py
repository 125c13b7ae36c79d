# SPDX-License-Identifier: Apache-2.0
"""Matched batched D3 floor derivation (round-3 VERDICT #4).

The 128 x 2000 / 21.2 A config runs the triangle-block Mosaic dense
sweep at 68.7 ms vs the H100's 46.0.  This probe derives the engine's
structural floor at that config:

- combo scaling: the same engine with combos forced to {min-image only}
  vs the 4 distance-surviving combos.  If time is ~proportional to the
  combo count, the sweep is VPU-op-bound (each combo re-runs the radial
  chain over every pair slot) and the floor is the 1-combo time x 4
  minus the shared (features, MXU dot) part.
- block sensitivity: block=128 (proven with images) vs what fits.
- tile-skip potential was estimated on host at ~11% (blocks of 128
  sorted atoms span ~0.3 box even spatially keyed; at cutoff/box = 0.51
  nearly every tile reaches every combo) — not implemented.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from nvalchemiops_tpu.interactions.dispersion.dense_d3 import (  # noqa: E402
    _image_combos,
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
cut = 21.2
combos4 = _image_combos(True, np.eye(3) * box, cut)
print(f"B={B} n={n} box={box:.1f} combos={combos4}", flush=True)
params = dict(a1=0.4289, a2=4.4407, s8=0.7875)

for label, combos, block in (
    ("4-combo/128 (production)", combos4, 128),
    ("1-combo/128", [(0, 0, 0)], 128),
    ("1-combo/256", [(0, 0, 0)], 256),
    ("4-combo/256", combos4, 256),
):
    def step(p, c=combos, b=block):
        _, f, _ = batch_dense_dftd3(
            p, numbers, cell, cut, rcov, r4r2, c6, cna, **params,
            images=True, engine="pallas", block=b,
            **({"combos": c} if False else {}))
        return f

    # batch_dense_dftd3 has no combos kwarg; call dense path directly
    from nvalchemiops_tpu.interactions.dispersion.dense_d3 import (
        _dense_pallas_impl, element_c6_mask,
    )
    dtype = jnp.float32
    mask_elem = element_c6_mask(c6)
    cna_b = cna.astype(dtype)[numbers]
    mask_b = mask_elem.astype(dtype)[numbers]
    zmax1 = rcov.shape[0]
    mesh = cna.shape[1]
    c6p = jnp.transpose(c6.astype(dtype), (0, 2, 1, 3)).reshape(
        zmax1, mesh, zmax1 * mesh)
    c6p_b = c6p[numbers]
    cells_b = jnp.broadcast_to(cell, (B, 3, 3))

    def step2(p, c=combos, b=block):
        _, f, _ = _dense_pallas_impl(
            p, numbers, cells_b, cut, rcov, r4r2, cna_b, mask_b, c6p_b,
            0.4289, 4.4407, 1.0, 0.7875, 16.0, -4.0, c, block=b)
        return f

    try:
        t = measure(step2, dep, (pos,), iters=2)
        print(f"{label:24s}: {t*1e3:8.2f} ms", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{label:24s}: FAILED {type(exc).__name__}: {exc}"[:250],
              flush=True)
print("done", flush=True)

# entry-point / return-set isolation (round-4: the dense_pallas parity
# probe read 92 ms for the same 4-combo/128 config this probe reads 61)
from nvalchemiops_tpu.interactions.dispersion.dense_d3 import (
    batch_dense_dftd3 as bdd,
)

def via_wrapper(p):
    e, f, cn = bdd(pos * 0 + p, numbers, cell, cut, rcov, r4r2, c6, cna,
                   a1=0.4289, a2=4.4407, s8=0.7875, images=True,
                   engine="pallas", block=128)
    return f

def via_wrapper_ef(p):
    e, f, cn = bdd(p, numbers, cell, cut, rcov, r4r2, c6, cna,
                   a1=0.4289, a2=4.4407, s8=0.7875, images=True,
                   engine="pallas", block=128)
    return e, f

def via_impl_ef(p):
    e, f, cn = _dense_pallas_impl(
        p, numbers, cells_b, cut, rcov, r4r2, cna_b, mask_b, c6p_b,
        0.4289, 4.4407, 1.0, 0.7875, 16.0, -4.0, combos4, block=128)
    return e, f

for label, fn in (("wrapper [f]/128", via_wrapper),
                  ("wrapper [e,f]/128", via_wrapper_ef),
                  ("impl [e,f]/128", via_impl_ef)):
    t = measure(fn, dep, (pos,), iters=2)
    print(f"{label:24s}: {t*1e3:8.2f} ms", flush=True)
print("done2", flush=True)
