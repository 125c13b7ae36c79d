# SPDX-License-Identifier: Apache-2.0
"""Window engine at 531k atoms (cap 64 -> lane_w 256, two-register windows)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid, choose_grid_geometry, grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements, grid_dftd3,
)
from nvalchemiops_tpu.pallas.window_sweep import window_lane_width  # noqa: E402

N_REP = int(os.environ.get("PROBE_NREP", "64"))  # 64 -> 524,288 atoms
dtype = jnp.float32
pos_np, cell_np, numbers_np, charges_np, rcov_np, r4r2_np, cna_np, c6_np = (
    build_system(n_rep=N_REP))
pos = jnp.asarray(pos_np, dtype)
cell = jnp.asarray(cell_np, dtype)
pbc = np.array([True] * 3)
cutoff = 9.6
numbers, rcov, r4r2, c6, cna = compact_d3_elements(
    numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
rcov, r4r2, c6, cna = (a.astype(dtype) for a in (rcov, r4r2, c6, cna))
dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
origin = (jnp.asarray(origin_np, dtype)
          if origin_np is not None and np.asarray(origin_np).any() else None)
print(f"N={pos.shape[0]} dims={dims} cap={cap} "
      f"lane_w={window_lane_width(cap, radius[2])}", flush=True)
dep = perturb_positions()

t_nl = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                         origin=origin), dep, (pos,), iters=4)
print(f"grid build : {t_nl*1e3:8.2f} ms", flush=True)

engines = os.environ.get("PROBE_ENGINES", "window,xla").split(",")
results = {}
if os.environ.get("PROBE_TIMING", "1") == "1":
    for eng in engines:
        def f(p, eng=eng):
            g = build_atom_grid(p, cell, pbc, dims, radius, cap,
                                origin=origin)
            return grid_dftd3(g, numbers, rcov, r4r2, c6, cna, cutoff,
                              0.4, 4.2, 1.8, engine=eng)
        try:
            t = measure(f, dep, (pos,), iters=2)
            results[eng] = t
            print(f"d3 {eng:7s}: {max(t - t_nl, 0)*1e3:8.2f} ms (excl build)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"d3 {eng:7s}: FAILED {type(exc).__name__}: {exc}"[:400],
                  flush=True)
else:
    results = {eng: None for eng in engines}

# force parity across the engines that ran (x-blocked window vs xla)
if len(results) > 1:
    fs = {}
    g = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)
    for eng in results:
        _, f_e, _ = grid_dftd3(g, numbers, rcov, r4r2, c6, cna, cutoff,
                               0.4, 4.2, 1.8, engine=eng)
        fs[eng] = np.asarray(f_e, np.float64)
    base = fs[next(iter(fs))]
    scale = np.abs(base).max()
    for eng, f_e in fs.items():
        d = np.abs(f_e - base) / scale
        # distribution matters: the CN-conditioning cliff concentrates in
        # a few outlier atoms (tiny RMS); a Mosaic lowering bug is broad
        print(f"d3 {eng:7s}: rel force diff vs first max={d.max():.3e} "
              f"rms={np.sqrt((d**2).mean()):.3e} "
              f"p99.99={np.percentile(d, 99.99):.3e} "
              f"n>1e-4={(d > 1e-4).sum()}", flush=True)

# coulomb window at the same geometry
try:
    charges = jnp.asarray(charges_np, dtype)
    def fc(p):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        return grid_coulomb_energy_forces(g, charges, cutoff, 0.35,
                                          engine="window")
    t = measure(fc, dep, (pos,), iters=2)
    print(f"coul window: {max(t - t_nl, 0)*1e3:8.2f} ms (excl build)",
          flush=True)
except Exception as exc:  # noqa: BLE001
    print(f"coul window: FAILED {type(exc).__name__}: {exc}"[:400], flush=True)
print("done", flush=True)
