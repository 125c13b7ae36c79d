# SPDX-License-Identifier: Apache-2.0
"""Batched D3 dense <-> grid crossover (round-4 VERDICT weak #6).

batch-dense-d3 is 5.3x faster than batch-grid-d3 at 16x2,000/27 A boxes,
but the dense sweep is O(n^2) per system while the grid is O(n) — the
router (dense_d3.batch_dftd3) needs the measured crossover.  Sweep
atoms-per-system at fixed density (~0.102 atoms/A^3, the suite's box)
and a 9 A cutoff, B=16 systems, measuring both engines.

Usage: nohup python benchmarks/r5_crossover_probe.py > log 2>&1 &
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
    batch_grid_dftd3,
)

B = int(os.environ.get("PROBE_B", "16"))
CUTOFF = 9.0
ZMAX = 16
DENSITY = 2000 / 27.0**3

rng = np.random.default_rng(11)
rcov = jnp.asarray(np.r_[0, rng.uniform(0.6, 1.2, ZMAX)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, ZMAX)], jnp.float32)
cna = jnp.asarray(
    np.vstack([np.zeros(5), np.cumsum(rng.uniform(0.3, 1, (ZMAX, 5)), 1)]),
    jnp.float32)
c6_np = rng.uniform(5, 40, (ZMAX + 1, ZMAX + 1, 5, 5))
c6_np[0] = 0
c6_np[:, 0] = 0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, jnp.float32)
dep = perturb_positions()
pbc = np.array([True] * 3)

warmed = [False]
for n in (int(s) for s in os.environ.get(
        "PROBE_NS", "2000,4096,8192,16384").split(",")):
    box = (n / DENSITY) ** (1.0 / 3.0)
    pos = jnp.asarray(rng.uniform(0, box, (B, n, 3)), jnp.float32)
    numbers = jnp.asarray(rng.integers(1, ZMAX + 1, (B, n)), jnp.int32)
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)

    def step_dense(p):
        _, f, _ = batch_dense_dftd3(p, numbers, cell, CUTOFF, rcov, r4r2,
                                    c6, cna, 0.4, 4.2, 1.8)
        return f

    def step_grid(p):
        _, f, _ = batch_grid_dftd3(p, numbers, cell, pbc, CUTOFF, rcov,
                                   r4r2, c6, cna, 0.4, 4.2, 1.8)
        return f

    for name, step in (("dense", step_dense), ("grid", step_grid)):
        try:
            if not warmed[0]:
                measure(step, dep, (pos,), iters=2)
                warmed[0] = True
            t = measure(step, dep, (pos,), iters=2)
            print(f"B={B} n={n:6d} box={box:6.1f}  {name:5s}: "
                  f"{t*1e3:8.2f} ms", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"B={B} n={n:6d} {name}: FAILED "
                  f"{type(exc).__name__}: {exc}"[:250], flush=True)
print("done", flush=True)
