# SPDX-License-Identifier: Apache-2.0
"""Matched batched D3 config (128 x 2000 @ 21.2 A): combo-delta A/B.

Round-4 floor: 60.9 ms measured, decomposed as 29.9 ms 1-combo base +
~9.3 ms per extra image combo of pure per-combo VPU radial work
(r4_dense_floor_probe); H100 is 46.0 ms.  The combo_carts delta form
reuses the min-image cart rotation and applies each extra combo as a
3-FMA cell-row delta, cutting the per-combo op count ~2.5x.  This probe
measures the matched row with the current code.

Usage: nohup python benchmarks/r5_matched_batch_probe.py > log 2>&1 &
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

B, npa = 128, 2000
BOX, CUTOFF, ZMAX = 41.2, 21.2, 16

# mirror bench_dftd3_batch's matched config exactly (same rng stream
# role, uniform positions, forces-only consumption) so the number is
# comparable to the committed 60.9 ms row
rng = np.random.default_rng(7)
pos = rng.uniform(0, BOX, (B, npa, 3))
numbers = rng.integers(1, ZMAX + 1, (B, npa)).astype(np.int32)
cell = np.eye(3) * BOX
rcov = np.r_[0.0, rng.uniform(0.6, 1.2, ZMAX)]
r4r2 = np.r_[0.0, rng.uniform(2.0, 5.0, ZMAX)]
cna = np.vstack([np.zeros(5),
                 np.cumsum(rng.uniform(0.3, 1.0, (ZMAX, 5)), 1)])
c6 = rng.uniform(5, 40, (ZMAX + 1, ZMAX + 1, 5, 5))
c6[0] = 0
c6[:, 0] = 0
c6 = 0.5 * (c6 + np.swapaxes(np.swapaxes(c6, 0, 1), 2, 3))

dep = perturb_positions()
args = (jnp.asarray(numbers), jnp.asarray(cell, jnp.float32), CUTOFF,
        jnp.asarray(rcov, jnp.float32), jnp.asarray(r4r2, jnp.float32),
        jnp.asarray(c6, jnp.float32), jnp.asarray(cna, jnp.float32),
        0.4, 4.2, 1.8)


pos_j = jnp.asarray(pos, jnp.float32)
blocks = [int(b) for b in os.environ.get("PROBE_BLOCKS",
                                         "256").split(",") if b.strip()]
warm = [False]
for blk in blocks:
    def step(p, _blk=blk):
        _, f, _ = batch_dense_dftd3(p, *args, block=_blk)
        return f

    try:
        if not warm[0]:
            measure(step, dep, (pos_j,), iters=2)  # warmup throwaway
            warm[0] = True
        t = measure(step, dep, (pos_j,), iters=3)
        print(f"matched batched D3 {B}x{npa} @ {CUTOFF} A block={blk}: "
              f"{t*1e3:.3f} ms (H100 46.0; r4 60.9)", flush=True)
    except Exception as exc:
        print(f"block={blk} FAILED: {type(exc).__name__}: {exc}"[:300],
              flush=True)
print("done", flush=True)

# ---- pair-list formulation floor (round-4 VERDICT task #5 "or" clause) ----
# The reference handles this workload with neighbor-matrix pair iteration
# (reference dftd3.py:1792-2122).  On TPU that formulation's inner loop is
# a per-pair random gather of j-side data; measure the matrix-path D3 on a
# batch slice and the raw gather floor to document the full-config cost.
if os.environ.get("PROBE_PAIRLIST", "0") == "1":
    import jax
    from nvalchemiops_tpu.interactions.dispersion import D3Parameters, dftd3
    from nvalchemiops_tpu.neighborlist import batch_naive_neighbor_list

    Bs = int(os.environ.get("PROBE_PL_B", "8"))
    posf = jnp.asarray(pos[:Bs].reshape(Bs * npa, 3), jnp.float32)
    batch_idx = jnp.asarray(np.repeat(np.arange(Bs), npa), jnp.int32)
    cells_b = jnp.asarray(np.tile(cell, (Bs, 1, 1)), jnp.float32)
    nm, num, sh = batch_naive_neighbor_list(
        posf, CUTOFF, pbc=np.array([True] * 3), cell=cells_b,
        batch_idx=batch_idx, max_neighbors=2560)
    kmax = int(jnp.max(num))
    print(f"pair-list: B={Bs} max_neighbors observed {kmax}", flush=True)
    cn_full = np.broadcast_to(
        cna[:, None, :, None], (ZMAX + 1, ZMAX + 1, 5, 5)).copy()
    params = D3Parameters(rcov=jnp.asarray(rcov, jnp.float32),
                          r4r2=jnp.asarray(r4r2, jnp.float32),
                          c6ab=jnp.asarray(c6, jnp.float32),
                          cn_ref=jnp.asarray(cn_full, jnp.float32))
    numbers_f = jnp.asarray(numbers[:Bs].reshape(-1))

    def step_pl(p):
        e, f, cn = dftd3(p, numbers_f, 0.4, 4.2, 1.8, d3_params=params,
                         cell=cells_b, batch_idx=batch_idx,
                         neighbor_matrix=nm, neighbor_matrix_shifts=sh)
        return f

    t = measure(step_pl, dep, (posf,), iters=2)
    print(f"matrix-path D3 {Bs}x{npa} @ {CUTOFF} A: {t*1e3:.3f} ms "
          f"-> x{B//Bs} extrapolated {t*1e3*B/Bs:.1f} ms for the full "
          f"config", flush=True)

    # raw j-side gather floor: positions[nm] alone
    def step_gather(p):
        pj = jnp.take(p, jnp.minimum(nm, Bs * npa - 1), axis=0)
        return jnp.sum(pj, axis=1)

    t = measure(step_gather, dep, (posf,), iters=2)
    print(f"raw positions[nm] gather {Bs}x{npa}: {t*1e3:.3f} ms "
          f"-> x{B//Bs} = {t*1e3*B/Bs:.1f} ms", flush=True)
