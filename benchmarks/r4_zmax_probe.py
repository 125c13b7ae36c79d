# SPDX-License-Identifier: Apache-2.0
"""Element-diversity scaling: D3 at ~97k atoms, zmax in {2, 8, 16, 32, 64}.

Round-3 VERDICT weak #7: every headline number used 2 compacted elements;
real MLIP workloads carry 10-90, and nothing bounded the cost curve.  The
window engine's candidate features are element-count-independent (the
in-kernel rf rebuild reads [mesh]-wide e/edc windows + element ids), but
the OWN-side lf features and the per-window MXU dots are [*, 2*zm] with
zm = (zmax+1)*mesh, so cost grows with zmax through the contraction
depth.  This probe measures the curve for the window and xla engines and
writes benchmarks/results/dftd3_zmax_benchmark_tpu-chip.csv.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal, tuned_grid, write_csv  # noqa: E402
from nvalchemiops_tpu.grid import build_atom_grid  # noqa: E402
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3  # noqa: E402

N_REP = int(os.environ.get("PROBE_NREP", "46"))
CUTOFF = 9.0
pos_np, cell_np = crystal(N_REP, 3.0)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(cell_np, jnp.float32)
pbc = np.array([True] * 3)
dims, radius, cap, origin = tuned_grid(pos, cell, pbc, CUTOFF, n)
print(f"N={n} dims={dims} cap={cap}", flush=True)
dep = perturb_positions()
# throwaway measurement: the first measure() of a fresh process reads
# high through the tunnel (round-4: 81 ms for a config that re-measures
# at ~24; warmup absorbs it)
_ = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                      origin=origin).ext_px,
            dep, (pos,), iters=4)
rows = []
for zmax in (2, 8, 16, 32, 64):
    rng = np.random.default_rng(zmax)
    rcov = jnp.asarray(np.r_[0, rng.uniform(0.6, 1.2, zmax)], jnp.float32)
    r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, zmax)], jnp.float32)
    cna = jnp.asarray(
        np.vstack([np.zeros(5),
                   np.cumsum(rng.uniform(0.3, 1, (zmax, 5)), 1)]),
        jnp.float32)
    c6_np = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5))
    c6_np[0] = 0
    c6_np[:, 0] = 0
    c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
    c6 = jnp.asarray(c6_np, jnp.float32)
    numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
    g0 = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)
    for eng in ("window", "xla"):
        def step(p, e=eng):
            gg = build_atom_grid(p, cell, pbc, dims, radius, cap,
                                 origin=origin)
            _, f, _ = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna,
                                 CUTOFF, 0.4, 4.2, 1.8, engine=e)
            return f
        try:
            t = measure(step, dep, (pos,), iters=2)
            print(f"zmax={zmax:3d} {eng:7s}: {t*1e3:8.2f} ms (incl build)",
                  flush=True)
            rows.append([eng, n, zmax, round(t * 1e3, 4),
                         round(t * 1e6 / n, 4)])
        except Exception as exc:  # noqa: BLE001
            print(f"zmax={zmax} {eng}: FAILED {type(exc).__name__}: "
                  f"{exc}"[:250], flush=True)
write_csv("benchmarks/results/dftd3_zmax_benchmark_tpu-chip.csv", rows,
          ["engine", "atoms", "zmax", "time_ms_incl_build", "us_per_atom"])
print("done", flush=True)
