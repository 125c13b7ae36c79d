# SPDX-License-Identifier: Apache-2.0
"""Per-engine on-chip f32 error vs a CPU f64 reference (smoke triage).

The smoke gate measures engine-vs-engine f32 spread ON CHIP; round-4's
z-structured feature matmul changed rounding paths and the spread grew to
~1e-4..1.4e-3 while the CPU spread stayed ~6e-6.  Engine-vs-engine can't
say WHICH engine moved.  This probe compares every chip engine against a
CPU f64 xla reference:

  phase 1 (CPU):  python benchmarks/r4_chip_vs_f64_probe.py save
  phase 2 (chip): python benchmarks/r4_chip_vs_f64_probe.py chip

If all engines sit at a common error level, the chip f32 rounding
(bf16x6 HIGHEST matmuls in the CN/feature path x the dC6/dCN
conditioning) sets a floor and the smoke tolerance must be anchored to
the chip xla engine's own error; if one engine is an outlier, that
engine's Mosaic lowering is wrong.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

REF_PATH = "/tmp/d3_f64_ref.npz"
CUTOFF = 9.6
GEOMS = {
    "auto-cap80": ((4, 4, 4), (1, 1, 1), 80),
    "fine-cap16": ((11, 11, 11), (1, 1, 1), 16),
}


def setup(dtype_str):
    import jax
    if dtype_str == "f64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from benchmarks.composite_accuracy import build_system
    from nvalchemiops_tpu.grid import build_atom_grid
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
        compact_d3_elements, grid_dftd3)
    dtype = jnp.float64 if dtype_str == "f64" else jnp.float32
    (pos_np, cell_np, numbers_np, _c,
     rcov_np, r4r2_np, cna_np, c6_np) = build_system(n_rep=13)
    pbc = np.array([True] * 3)
    numbers, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
    tabs = tuple(a.astype(dtype) for a in (rcov, r4r2, c6, cna))
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)

    def run(tag, engine):
        dims, radius, cap = GEOMS[tag]
        g = build_atom_grid(pos, cell, pbc, dims, radius, cap)
        # A cell over cap would silently drop atoms to the trash slot, and
        # f32-vs-f64 binning of boundary atoms could differ between the two
        # phases — either would inflate the reported error with
        # grid-assignment differences rather than engine rounding.
        occ = int(np.asarray(g.counts_max))
        if occ > cap:
            raise RuntimeError(f"{tag}: cell occupancy {occ} > cap {cap}")
        _, f, _ = grid_dftd3(g, numbers, tabs[0], tabs[1], tabs[2], tabs[3],
                             CUTOFF, 0.4, 4.2, 1.8, engine=engine)
        return np.asarray(f, np.float64)

    return run


def main():
    mode = sys.argv[1] if sys.argv[1:] else "chip"
    if mode == "save":
        run = setup("f64")
        np.savez(REF_PATH, **{t: run(t, "xla") for t in GEOMS})
        print(f"saved {REF_PATH}", flush=True)
        return
    ref = np.load(REF_PATH)
    run = setup("f32")
    for tag in GEOMS:
        scale = np.abs(ref[tag]).max()
        engines = ("xla", "window", "block") if tag == "auto-cap80" else (
            "xla", "window")
        for eng in engines:
            try:
                err = np.abs(run(tag, eng) - ref[tag]).max() / scale
                print(f"[{tag}] {eng:7s} f32-vs-cpu64: {err:.3e}", flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"[{tag}] {eng:7s} FAILED {type(exc).__name__}: "
                      f"{exc}"[:200], flush=True)


if __name__ == "__main__":
    main()
