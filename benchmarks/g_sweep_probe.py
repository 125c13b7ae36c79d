# SPDX-License-Identifier: Apache-2.0
"""Sweep the super-chunk size G for the D3 block engine at the bench shape.

Per-own-row candidate work is the full window W = (G+2Rx)*cap lanes, so a
smaller G does strictly less VPU+MXU work per row; the question is whether
Mosaic per-block overheads eat the gain.  cap=32 makes G=2 a perfect
[64, 128] tile.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    build_atom_grid,
    choose_grid_origin,
    estimate_grid_geometry,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3


def main():
    n_rep, a = 48, 3.0
    rng = np.random.default_rng(0)
    grid_pts = np.stack(
        np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"), -1
    ).reshape(-1, 3) * a
    pos_np = grid_pts + rng.uniform(-0.2, 0.2, grid_pts.shape)
    n = pos_np.shape[0]
    cell_np = np.eye(3) * (n_rep * a)

    dtype = jnp.float32
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pbc = np.array([True] * 3)
    cutoff = 9.0

    zmax = 16
    numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
    rcov = jnp.asarray(np.r_[0.0, rng.uniform(0.6, 1.2, zmax)], dtype)
    r4r2 = jnp.asarray(np.r_[0.0, rng.uniform(2.0, 5.0, zmax)], dtype)
    cna = jnp.asarray(
        np.vstack([np.zeros(5), np.cumsum(rng.uniform(0.3, 1.0, (zmax, 5)), 1)]),
        dtype,
    )
    c6_np = rng.uniform(5.0, 40.0, (zmax + 1, zmax + 1, 5, 5))
    c6_np[0] = 0.0
    c6_np[:, 0] = 0.0
    c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
    c6 = jnp.asarray(c6_np, dtype)

    dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n,
                                               target_occupancy=0.75)
    origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
    origin = jnp.asarray(origin_np, dtype) if origin_np.any() else None
    cap = max(int(np.ceil((observed + 1) / 8)) * 8,
              int(np.ceil(observed * 1.02 / 8)) * 8)
    print(f"N={n} dims={dims} cap={cap} origin={origin_np}", flush=True)

    g0 = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)
    dep = perturb_positions()

    ref = None
    for G in (None, 1, 2, 4, 8):
        def d3_step(p, G=G):
            gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
            _, forces, _ = grid_dftd3(
                gg, numbers, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8,
                block_G=G,
            )
            return forces

        # correctness spot-check vs the default-G result
        _, f, _ = grid_dftd3(g0, numbers, rcov, r4r2, c6, cna, cutoff,
                             0.4, 4.2, 1.8, block_G=G)
        f = np.asarray(f)
        if ref is None:
            ref = f
        err = np.abs(f - ref).max()
        t = measure(d3_step, dep, (pos,), iters=3)
        print(f"G={G}: D3 {t * 1e3:8.2f} ms  maxdiff {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
