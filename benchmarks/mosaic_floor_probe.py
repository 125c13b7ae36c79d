# SPDX-License-Identifier: Apache-2.0
"""Decompose the Mosaic block-sweep engine's cost on the CsCl composite.

Round-1 measured the block engine ~1.3x SLOWER than the jnp/XLA sweep
even though the XLA sweep streams every [M, W] intermediate through HBM
(~0.4 ms per elementwise op at 110k atoms) while the Mosaic kernel holds
blocks in VMEM.  VPU speed-of-light for a ~45-op pass body over ~1.1e8
candidate slots is ~1.5 ms/pass — an order of magnitude below what either
engine achieves, so the block engine is losing to overheads, not flops.

Stages measured (CsCl n_rep=38, dims 16^3, cap 40 — the round-2 composite
geometry):
- xla / block / block-G variants of the full D3;
- a TRIVIAL pair-count body through block_sweep with pass-1 shapes
  (the harness floor: program dispatch + window fetch + reduce);
- pass-1-only (CN) on both engines (the leanest real body).
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
    build_atom_grid, choose_grid_geometry, _interior,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements, grid_dftd3,
)
from nvalchemiops_tpu.pallas.block_sweep import (  # noqa: E402
    block_sweep, choose_super_chunk, pack_columns,
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
    pbc = np.array([True] * 3)
    cutoff = 9.0
    numbers, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
    rcov, r4r2, c6, cna = (a.astype(dtype) for a in (rcov, r4r2, c6, cna))

    dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
    origin = (jnp.asarray(origin_np, dtype)
              if origin_np is not None and np.asarray(origin_np).any() else None)
    cz, cy, cx = dims
    rz, ry, rx = radius
    print(f"N={n} dims={dims} radius={radius} cap={cap} "
          f"slots/atom-pass={cz*cy*cx*cap*cap*((rx+1)+(((2*rz+1)*(2*ry+1)-1)//2)*(2*rx+1))/n:.0f}",
          flush=True)

    dep = perturb_positions()

    t_build = measure(
        lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin),
        dep, (pos,), iters=8)
    print(f"grid build          : {t_build*1e3:8.2f} ms", flush=True)

    def d3(p, engine, **kw):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        return grid_dftd3(g, numbers, rcov, r4r2, c6, cna, cutoff,
                          0.4, 4.2, 1.8, engine=engine, **kw)

    for label, kw in [
        ("xla full", dict(engine="xla")),
        ("xla p1+p2 (skip_chain)", dict(engine="xla", skip_chain=True)),
        ("block full", dict(engine="block")),
        ("block p1+p2", dict(engine="block", skip_chain=True)),
    ]:
        try:
            t = measure(lambda p, kw=kw: d3(p, **kw), dep, (pos,), iters=3)
            print(f"{label:22s}: {t*1e3:8.2f} ms", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{label:22s}: FAILED {type(exc).__name__}: {exc}",
                  flush=True)

    # ---- trivial body through block_sweep: the harness floor --------------
    def floor_fn(p, G):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        lext = (cx + 2 * rx) * cap
        ez, ey = cz + 2 * rz, cy + 2 * ry

        def rows(pl):
            return pl.reshape(ez, ey, lext)

        own = {"s": pack_columns(_interior(g, g.ext_px),
                                 _interior(g, g.ext_py),
                                 _interior(g, g.ext_pz))}
        crow = {"px": rows(g.ext_px), "py": rows(g.ext_py),
                "pz": rows(g.ext_pz)}

        def body(ownd, crowd, ccold, pair_ok):
            s = ownd["s"]
            dx = crowd["px"] - s[:, 0:1]
            dy = crowd["py"] - s[:, 1:2]
            dz = crowd["pz"] - s[:, 2:3]
            d2 = dx * dx + dy * dy + dz * dz
            f = jnp.where(pair_ok & (d2 < cutoff * cutoff) & (d2 > 1e-20),
                          1.0, 0.0)
            return (f,), (f,)

        (cnt,), (cnt_j,) = block_sweep(dims, radius, cap, own, crow, {},
                                       body, 1, 1, G=G, dtype=dtype)
        return jnp.sum(cnt) + jnp.sum(cnt_j)

    for G in sorted({1, 2, 4, 8, choose_super_chunk(cx, cap, rx)}):
        if cx % G:
            continue
        try:
            t = measure(lambda p, G=G: floor_fn(p, G), dep, (pos,), iters=3)
            m = G * cap
            w = (G + 2 * rx) * cap
            print(f"trivial body G={G:2d} (M={m:3d} W={w:4d}): "
                  f"{max(t - t_build, 0.0)*1e3:8.2f} ms (excl build)",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"trivial G={G}: FAILED {type(exc).__name__}: {exc}",
                  flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
