# SPDX-License-Identifier: Apache-2.0
"""Chip drive + timing for the production window engines (D3 + Coulomb).

End-to-end verification at the composite scale (109,744-atom CsCl): runs
``grid_dftd3(engine="window")`` and ``grid_coulomb_energy_forces(
engine="window")`` through the public API on the live backend, checks
energy/CN/force parity against the XLA row-sweep engine, and times each
engine with the chained-jit harness.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid, choose_grid_geometry, grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements, grid_dftd3,
)

N_REP = int(os.environ.get("PROBE_NREP", "38"))


def main():
    dtype = jnp.float32
    pos_np, cell_np, numbers_np, charges_np, rcov_np, r4r2_np, cna_np, c6_np = (
        build_system(n_rep=N_REP)
    )
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    charges = jnp.asarray(charges_np, dtype)
    pbc = np.array([True] * 3)
    cutoff = 9.6
    alpha = 0.35

    numbers, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
    rcov, r4r2, c6, cna = (a.astype(dtype) for a in (rcov, r4r2, c6, cna))

    dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
    origin = (jnp.asarray(origin_np, dtype)
              if origin_np is not None and np.asarray(origin_np).any() else None)
    print(f"N={n} dims={dims} cap={cap}", flush=True)

    dep = perturb_positions()

    def d3_step(p, engine, **kw):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        return grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                          0.4, 4.2, 1.8, engine=engine, **kw)

    def coul_step(p, engine):
        gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        return grid_coulomb_energy_forces(gg, charges, cutoff, alpha,
                                          engine=engine)

    # ---- correctness parity on the live backend ---------------------------
    e_x, f_x, cn_x = d3_step(pos, "xla")
    e_w, f_w, cn_w = d3_step(pos, "window")
    fs = float(jnp.max(jnp.abs(f_x)))
    print(f"D3 parity: dE_rel={abs(float(e_x - e_w)) / abs(float(e_x)):.3e} "
          f"dCN={float(jnp.max(jnp.abs(cn_x - cn_w))):.3e} "
          f"dF={float(jnp.max(jnp.abs(f_x - f_w))):.3e} (Fscale {fs:.3e})",
          flush=True)
    ec_x, fc_x = coul_step(pos, None)
    ec_w, fc_w = coul_step(pos, "window")
    print(f"Coulomb parity: dE={float(jnp.max(jnp.abs(ec_x - ec_w))):.3e} "
          f"dF={float(jnp.max(jnp.abs(fc_x - fc_w))):.3e} "
          f"(Fscale {float(jnp.max(jnp.abs(fc_x))):.3e})", flush=True)

    # ---- timing ------------------------------------------------------------
    t_nl = measure(
        lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                  origin=origin), dep, (pos,), iters=8)
    print(f"grid build        : {t_nl * 1e3:8.2f} ms", flush=True)

    for label, f in (
        ("d3 window        ", lambda p: d3_step(p, "window")),
        ("d3 window bf16   ", lambda p: d3_step(p, "window",
                                                feature_dtype=jnp.bfloat16)),
        ("d3 xla           ", lambda p: d3_step(p, "xla")),
        ("coulomb window   ", lambda p: coul_step(p, "window")),
        ("coulomb xla      ", lambda p: coul_step(p, None)),
    ):
        try:
            t = measure(f, dep, (pos,), iters=3)
            print(f"{label}: {max(t - t_nl, 0) * 1e3:8.2f} ms (excl build)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{label}: FAILED {type(exc).__name__}: {exc}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()


def pme_variants():
    """Timing for the PME spread/gather engine variants (composite config)."""
    from nvalchemiops_tpu.interactions.electrostatics.pme import (
        _pme_reciprocal_impl,
    )
    from nvalchemiops_tpu.spline_windowed import observed_tile_capacity

    dtype = jnp.float32
    pos_np, cell_np, _numbers, charges_np, *_ = build_system(n_rep=N_REP)
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    charges = jnp.asarray(charges_np, dtype)
    mesh = (128, 128, 128) if N_REP >= 24 else (32, 32, 32)
    tile_cap = observed_tile_capacity(pos, cell, mesh)
    dep = perturb_positions()

    for label, kw in (
        ("pme xla spread/gather   ", {}),
        ("pme pallas spread       ", dict(spread_engine="pallas")),
        ("pme pallas spread+gather", dict(spread_engine="pallas",
                                          gather_engine="pallas")),
    ):
        def f(p, kw=kw):
            e, forces, _ = _pme_reciprocal_impl(
                p, charges, cell.reshape(1, 3, 3),
                jnp.asarray([0.35], dtype), mesh, 4, None, True, False,
                None, None, tile_capacity=tile_cap, **kw)
            return e, forces

        try:
            t = measure(f, dep, (pos,), iters=3)
            print(f"{label}: {t*1e3:8.2f} ms", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{label}: FAILED {type(exc).__name__}: {exc}", flush=True)


if os.environ.get("PROBE_PME"):
    pme_variants()
