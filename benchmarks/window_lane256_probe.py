# SPDX-License-Identifier: Apache-2.0
"""Probe: window engine at lane_w = 256 (cap 48 geometries).

The benchmark-suite D3 config (a=3.0 crystal, 9.0 A cutoff) bins to
cap 48, so the window lane width rounds to 256 and the auto-select gate
(lane_w == 128) falls back to xla: 49.3 ms at 97k / 203.6 at 262k.
This probe forces engine="window" at that exact geometry to test the
two-register-window Mosaic compile, parity vs xla, and the timing —
evidence for relaxing the gate to lane_w <= 256.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal, tuned_grid  # noqa: E402
from nvalchemiops_tpu.grid import build_atom_grid  # noqa: E402
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3  # noqa: E402
from nvalchemiops_tpu.pallas.window_sweep import window_lane_width  # noqa: E402

N_REP = int(os.environ.get("PROBE_NREP", "46"))
dep = perturb_positions()
rng = np.random.default_rng(1)
zmax = 16
rcov = jnp.asarray(np.r_[0, rng.uniform(0.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, zmax)], jnp.float32)
cna = jnp.asarray(
    np.vstack([np.zeros(5), np.cumsum(rng.uniform(0.3, 1, (zmax, 5)), 1)]),
    jnp.float32)
c6_np = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0
c6_np[:, 0] = 0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, jnp.float32)

pos_np, cell_np = crystal(N_REP, 3.0)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(cell_np, jnp.float32)
pbc = np.array([True] * 3)
numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
dims, radius, cap, origin = tuned_grid(pos, cell, pbc, 9.0, n)
print(f"N={n} dims={dims} cap={cap} "
      f"lane_w={window_lane_width(cap, radius[2])}", flush=True)

g = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)
outs = {}
for eng in ("xla", "window"):
    try:
        e, f, cn = grid_dftd3(g, numbers, rcov, r4r2, c6, cna, 9.0,
                              0.4, 4.2, 1.8, engine=eng)
        outs[eng] = np.asarray(f, np.float64)
        print(f"d3 {eng:7s}: E = {float(e):.8e}", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"d3 {eng:7s}: FAILED {type(exc).__name__}: {exc}"[:300],
              flush=True)
if len(outs) == 2:
    scale = np.abs(outs["xla"]).max()
    d = np.abs(outs["window"] - outs["xla"]) / scale
    print(f"window-vs-xla rel force: max={d.max():.3e} "
          f"rms={np.sqrt((d**2).mean()):.3e} n>1e-4={(d > 1e-4).sum()}",
          flush=True)

    def step(p, eng):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        return grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, 9.0,
                          0.4, 4.2, 1.8, engine=eng)

    for eng in ("window", "xla"):
        t = measure(lambda p, e=eng: step(p, e), dep, (pos,), iters=3)
        print(f"d3 {eng:7s}: {t*1e3:8.2f} ms (incl build)", flush=True)
print("done", flush=True)
