# SPDX-License-Identifier: Apache-2.0
"""Diagnose the round-4 smoke-gate D3 engine spread (cap80/fine-cap16).

Question: is the ~1e-3 window-vs-xla f32 force spread on chip (a) the
intrinsic D3 f32 conditioning floor (CN rounding x dC6/dCN — CLAUDE.md
rule: ~1e-2 f32-vs-f64, identical across engines) surfacing because the
round-4 z-structured feature matmul changed the xla engine's rounding
path, or (b) a real Mosaic lowering divergence?

Method: at the exact smoke geometries, on ONE backend, measure
  xla-f32 vs window-f32   (the smoke metric)
  xla-f64 vs window-f64   (engine agreement floor, historically ~5e-8)
  xla-f32 vs xla-f64      (per-engine conditioning error)
  window-f32 vs xla-f64
If the f32 spread is comparable to the per-engine conditioning error on
CPU as well, the smoke metric is measuring conditioning, not lowering.

Usage: [JAX_PLATFORMS=cpu] python benchmarks/r4_smoke_diag_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# the axon TPU plugin ignores JAX_PLATFORMS; force CPU via jax.config
# (this probe needs f64, and the chip can't compile the f64 cell inverse)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid,
    choose_grid_geometry,
    estimate_grid_geometry,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements,
    grid_dftd3,
)

CUTOFF = 9.6


def forces(g, numbers, tabs, dtype, engine):
    rcov, r4r2, c6, cna = (a.astype(dtype) for a in tabs)
    _, f, _ = grid_dftd3(g, numbers, rcov, r4r2, c6, cna, CUTOFF,
                         0.4, 4.2, 1.8, engine=engine)
    return np.asarray(f, np.float64)


def rel(a, b, scale):
    return np.abs(a - b).max() / scale


def main():
    n_rep = int(os.environ.get("SMOKE_NREP", "13"))
    (pos_np, cell_np, numbers_np, _charges,
     rcov_np, r4r2_np, cna_np, c6_np) = build_system(n_rep=n_rep)
    pbc = np.array([True] * 3)
    numbers, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
    tabs = (rcov, r4r2, c6, cna)

    pos32 = jnp.asarray(pos_np, jnp.float32)
    cell32 = jnp.asarray(cell_np, jnp.float32)
    pos64 = jnp.asarray(pos_np, jnp.float64)
    cell64 = jnp.asarray(cell_np, jnp.float64)

    geoms = {}
    dims, radius, cap, origin = choose_grid_geometry(pos32, cell32, pbc,
                                                     CUTOFF)
    geoms[f"auto-cap{cap}"] = (dims, radius, cap, origin)
    fdims, fradius, fcap = estimate_grid_geometry(
        cell32, pbc, CUTOFF, pos32.shape[0], target_occupancy=0.5,
        bins_per_cutoff=2)
    geoms[f"fine-cap{fcap}"] = (fdims, fradius, fcap, None)

    print(f"backend={jax.default_backend()}", flush=True)
    for tag, (d, r, c, o) in geoms.items():
        o32 = (jnp.asarray(o, jnp.float32)
               if o is not None and np.asarray(o).any() else None)
        o64 = (jnp.asarray(o, jnp.float64)
               if o is not None and np.asarray(o).any() else None)
        g32 = build_atom_grid(pos32, cell32, pbc, d, r, c, origin=o32)
        g64 = build_atom_grid(pos64, cell64, pbc, d, r, c, origin=o64)
        fx32 = forces(g32, numbers, tabs, np.float32, "xla")
        fw32 = forces(g32, numbers, tabs, np.float32, "window")
        fx64 = forces(g64, numbers, tabs, np.float64, "xla")
        fw64 = forces(g64, numbers, tabs, np.float64, "window")
        s = np.abs(fx64).max()
        print(f"[{tag}] dims={d} cap={c}", flush=True)
        print(f"  xla32-vs-win32 : {rel(fx32, fw32, s):.3e}  (smoke metric)")
        print(f"  xla64-vs-win64 : {rel(fx64, fw64, s):.3e}  (engine floor)")
        print(f"  xla32-vs-xla64 : {rel(fx32, fx64, s):.3e}  (conditioning)")
        print(f"  win32-vs-xla64 : {rel(fw32, fx64, s):.3e}", flush=True)


if __name__ == "__main__":
    main()
