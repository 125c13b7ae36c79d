# SPDX-License-Identifier: Apache-2.0
"""Pre-bench on-chip smoke gate: engine force agreement at f32.

Runs the D3 window/block/xla engines and the Coulomb window/xla engines
on one ~4k-atom CsCl system ON THE REAL CHIP and asserts the Mosaic
engines agree with the XLA engine to f32 engine-fidelity tolerance.
Interpret-mode CPU tests provably cannot catch TPU bf16-lowering bugs
(CLAUDE.md rule 16: a default-precision MXU pass in the plane-space D3
features cost 6e-2 force error and passed every CPU test), so this is
the mandatory ~2-min gate before any round-end bench (round-2 VERDICT
weak #7 / next-round #8).

Exit code 0 = all engines agree; 1 = any engine exceeds tolerance.

Usage: python benchmarks/chip_smoke.py  (chip must be free; see
CLAUDE.md TPU measurement rules).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid,
    choose_grid_geometry,
    grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements,
    grid_dftd3,
)

# Engines agree to ~5e-8 at f64; at f32 the relative force spread between
# engines is pure rounding-path noise.  1e-4 is ~100x the measured
# engine-to-engine spread but far below the 6e-2 class of bf16-lowering
# bugs this gate exists to catch.
TOL = 1e-4
CUTOFF = 9.6
ALPHA = 0.35


def check_geometry(g, tag, numbers, rcov, r4r2, c6, cna, charges,
                   d3_engines=("xla", "window", "windowxb", "block")):
    """Engine force-agreement block for one grid geometry; returns failed."""
    failed = False
    d3_forces = {}
    # windowxb = window with a forced 1-cell x-block (3-D Mosaic grid):
    # gates the nxb>1 lowering used at >131k-atom geometries on every
    # round (the x-blocked path must agree with the single-block one)
    for eng in d3_engines:
        real_eng = "window" if eng == "windowxb" else eng
        try:
            if eng == "windowxb":
                os.environ["NVALCHEMIOPS_WINDOW_X_BLOCK"] = "1"
            e, f, cn = grid_dftd3(g, numbers, rcov, r4r2, c6, cna, CUTOFF,
                                  0.4, 4.2, 1.8, engine=real_eng)
            d3_forces[eng] = np.asarray(f, np.float64)
            print(f"[{tag}] d3 {eng:8s}: E = {float(e):.8e}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"[{tag}] d3 {eng:8s}: FAILED {type(exc).__name__}: "
                  f"{exc}"[:300], flush=True)
            failed = True
        finally:
            os.environ.pop("NVALCHEMIOPS_WINDOW_X_BLOCK", None)
    scale = np.abs(d3_forces["xla"]).max()
    for eng, f in d3_forces.items():
        err = np.abs(f - d3_forces["xla"]).max() / scale
        ok = err <= TOL
        failed |= not ok
        print(f"[{tag}] d3 {eng:7s}: max rel force diff vs xla = {err:.3e} "
              f"{'ok' if ok else 'FAIL'}", flush=True)

    coul_forces = {}
    for eng in ("xla", "window"):
        try:
            e, f = grid_coulomb_energy_forces(g, charges, CUTOFF, ALPHA,
                                              engine=eng)
            coul_forces[eng] = np.asarray(f, np.float64)
            print(f"[{tag}] coul {eng:5s}: E = {float(jnp.sum(e)):.8e}",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"[{tag}] coul {eng:5s}: FAILED {type(exc).__name__}: "
                  f"{exc}"[:300], flush=True)
            failed = True
    scale = np.abs(coul_forces["xla"]).max()
    for eng, f in coul_forces.items():
        err = np.abs(f - coul_forces["xla"]).max() / scale
        ok = err <= TOL
        failed |= not ok
        print(f"[{tag}] coul {eng:5s}: max rel force diff vs xla = {err:.3e} "
              f"{'ok' if ok else 'FAIL'}", flush=True)
    return failed


def main():
    n_rep = int(os.environ.get("SMOKE_NREP", "13"))  # 13 -> 4,394 atoms
    dtype = jnp.float32
    (pos_np, cell_np, numbers_np, charges_np,
     rcov_np, r4r2_np, cna_np, c6_np) = build_system(n_rep=n_rep)
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    charges = jnp.asarray(charges_np, dtype)
    pbc = np.array([True] * 3)
    numbers, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
    rcov, r4r2, c6, cna = (a.astype(dtype) for a in (rcov, r4r2, c6, cna))
    dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, CUTOFF)
    origin = (jnp.asarray(origin_np, dtype)
              if origin_np is not None and np.asarray(origin_np).any()
              else None)
    print(f"backend={jax.default_backend()} N={pos.shape[0]} dims={dims} "
          f"cap={cap} radius={radius}", flush=True)
    g = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)

    failed = check_geometry(g, f"cap{cap}", numbers, rcov, r4r2, c6, cna,
                            charges)

    # Cap-boundary sweep (round-3 weak #9: the lane_w=256 miscompile lived
    # at a cap the old single-config smoke never touched).  Forced caps
    # cross the one-register boundary: 48 -> lane_w 256 (2 sub-windows),
    # 88 -> lane_w 384 (3 sub-windows); same physics (extra slots are
    # parked empties), so xla-vs-window agreement still gates the Mosaic
    # lowering of the sub-window split at every width.
    for forced_cap in (48, 88):
        if forced_cap <= cap:
            continue
        gf = build_atom_grid(pos, cell, pbc, dims, radius, forced_cap,
                             origin=origin)
        failed |= check_geometry(
            gf, f"cap{forced_cap}", numbers, rcov, r4r2, c6, cna, charges,
            d3_engines=("xla", "window", "windowxb"))

    # one-register (lane_w = 128) coverage: a 2x-finer partition with a
    # small cap, the regime every pre-round-4 headline ran in
    from nvalchemiops_tpu.grid import estimate_grid_geometry
    fdims, fradius, fcap = estimate_grid_geometry(
        cell, pbc, CUTOFF, pos.shape[0], target_occupancy=0.5,
        bins_per_cutoff=2)
    from nvalchemiops_tpu.pallas.window_sweep import window_lane_width
    if window_lane_width(fcap, fradius[2]) == 128:
        gf = build_atom_grid(pos, cell, pbc, fdims, fradius, fcap)
        failed |= check_geometry(
            gf, f"fine-cap{fcap}", numbers, rcov, r4r2, c6, cna, charges,
            d3_engines=("xla", "window", "windowxb"))
    else:
        print(f"[fine] skipped: lane_w "
              f"{window_lane_width(fcap, fradius[2])} != 128 "
              f"(dims={fdims} cap={fcap})", flush=True)

    print("SMOKE " + ("FAIL" if failed else "PASS"), flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
