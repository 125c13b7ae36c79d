# SPDX-License-Identifier: Apache-2.0
"""The reference's flagship single-system D3 config: 85,750 atoms @ 21.2 A.

Round-4 VERDICT missing #2 / task #3: the H100 measures this config at
16.454 ms (97.6M pairs, ~2,276 neighbors/atom; D3 time excludes the
neighbor build per the reference's protocol) and the repo had no TPU row.
The high-cutoff regime is where cube-sweep slack hurts most: the swept
slots per atom are ``n_rows x lane_w x cap / occ`` and the best geometry
is NOT the suite default.  This probe measures the window engine across
``bins_per_cutoff`` 2..5 plus the auto geometry, reporting build and
D3-minus-build separately.

Usage: nohup python benchmarks/r5_d3_21A_probe.py > /tmp/r5d21.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import (  # noqa: E402
    D3_A1, D3_A2, D3_S8, build_system,
)
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid, choose_grid_geometry, estimate_grid_geometry,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements, grid_dftd3,
)

CUTOFF = 21.2
N_REP = 35  # 85,750 atoms (the reference's largest dftd3 row)

(pos_np, cell_np, numbers_np, _q, rcov_np, r4r2_np, cna_np,
 c6_np) = build_system(n_rep=N_REP)
n = pos_np.shape[0]
numbers, rcov, r4r2, c6, cna = compact_d3_elements(
    numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
dtype = jnp.float32
pos = jnp.asarray(pos_np, dtype)
cell = jnp.asarray(cell_np, dtype)
pbc = np.array([True] * 3)
tabs = tuple(jnp.asarray(a, dtype) for a in (rcov, r4r2, c6, cna))
dep = perturb_positions()
print(f"N={n} box={cell_np[0,0]:.1f} cutoff={CUTOFF}", flush=True)

warmed = [False]


def run_geom(tag, dims, radius, cap, origin=None, engine=None):
    g0 = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)
    occ = int(g0.counts_max)
    if occ > cap:
        print(f"[{tag}] OVERFLOW occ {occ} > cap {cap}", flush=True)
        return
    capt = int(np.ceil(occ / 8)) * 8
    del g0

    def build_step(p):
        return build_atom_grid(p, cell, pbc, dims, radius, capt,
                               origin=origin).ext_px

    def d3_step(p):
        gg = build_atom_grid(p, cell, pbc, dims, radius, capt,
                             origin=origin)
        return grid_dftd3(gg, numbers, *tabs, CUTOFF, D3_A1, D3_A2, D3_S8,
                          engine=engine)

    if not warmed[0]:
        measure(build_step, dep, (pos,), iters=4)  # throwaway warmup
        warmed[0] = True
    t_b = measure(build_step, dep, (pos,), iters=4)
    t_t = measure(d3_step, dep, (pos,), iters=3)
    t_d3 = max(t_t - t_b, 0.0)
    print(f"[{tag}] dims={dims} cap={capt} build {t_b*1e3:.2f} ms, "
          f"D3 {t_d3*1e3:.2f} ms ({t_d3*1e6/n:.3f} us/atom), "
          f"total {t_t*1e3:.2f}", flush=True)


for bpc in (2, 3, 4, 5):
    try:
        dims, radius, cap = estimate_grid_geometry(
            cell, pbc, CUTOFF, n, target_occupancy=0.66,
            bins_per_cutoff=bpc)
        run_geom(f"bpc{bpc}", dims, radius, cap)
    except Exception as exc:  # noqa: BLE001
        print(f"[bpc{bpc}] FAILED {type(exc).__name__}: {exc}"[:300],
              flush=True)

try:
    dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc,
                                                        CUTOFF)
    origin = (jnp.asarray(origin_np, dtype)
              if origin_np is not None and np.asarray(origin_np).any()
              else None)
    run_geom("auto", dims, radius, cap, origin=origin)
except Exception as exc:  # noqa: BLE001
    print(f"[auto] FAILED {type(exc).__name__}: {exc}"[:300], flush=True)

print("done", flush=True)
