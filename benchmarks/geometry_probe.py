# SPDX-License-Identifier: Apache-2.0
"""Probe: choose_grid_geometry vs estimate_grid_geometry at 512k atoms.

The NREP=80 crystal (240 A box, 9 A cutoff -> 26.67 bins/axis) is the
measured 26-vs-27-bin case: plain truncation gives 26 bins (the faster
geometry, found by hand last round).  This validates that the geometry
search (a) agrees where truncation was already right and (b) would have
caught the inverse case.  Also compares D3 end-to-end on both picks at
NREP=46 (the documented 1.6x-occupancy-slack incommensurate box).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    build_atom_grid, choose_grid_geometry, choose_grid_origin,
    estimate_grid_geometry,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3

dep = perturb_positions()

for n_rep in (46, 80):
    a = 3.0
    rng = np.random.default_rng(0)
    gpts = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"),
                    -1).reshape(-1, 3) * a
    pos_np = gpts + rng.uniform(-0.2, 0.2, gpts.shape)
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, jnp.float32)
    cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
    pbc = np.array([True] * 3)
    cutoff = 9.0
    zmax = 16
    numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
    rcov = jnp.asarray(np.r_[0, rng.uniform(.6, 1.2, zmax)], jnp.float32)
    r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, zmax)], jnp.float32)
    cna = jnp.asarray(
        np.vstack([np.zeros(5),
                   np.cumsum(rng.uniform(.3, 1, (zmax, 5)), 1)]), jnp.float32)
    c6_np = rng.uniform(5, 40, (zmax + 1, zmax + 1, 5, 5))
    c6_np[0] = 0
    c6_np[:, 0] = 0
    c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
    c6 = jnp.asarray(c6_np, jnp.float32)

    # (a) estimate + origin + observed cap (current bench recipe)
    dims_e, rad_e, _ = estimate_grid_geometry(cell, pbc, cutoff, n,
                                              target_occupancy=0.75)
    org_np, obs = choose_grid_origin(pos, cell, pbc, dims_e)
    cap_e = max(int(np.ceil((obs + 1) / 8)) * 8,
                int(np.ceil(obs * 1.02 / 8)) * 8)
    org_e = jnp.asarray(org_np, jnp.float32) if org_np.any() else None

    # (b) geometry search
    dims_s, rad_s, cap_s, org_s_np = choose_grid_geometry(pos, cell, pbc,
                                                          cutoff)
    org_s = (jnp.asarray(org_s_np, jnp.float32)
             if org_s_np is not None else None)
    print(f"NREP={n_rep}: estimate dims={dims_e} cap={cap_e} | "
          f"search dims={dims_s} cap={cap_s}", flush=True)

    for label, dims, rad, cap, org in (
        ("estimate", dims_e, rad_e, cap_e, org_e),
        ("search  ", dims_s, rad_s, cap_s, org_s),
    ):
        def step(p, d=dims, r=rad, c=cap, o=org):
            gg = build_atom_grid(p, cell, pbc, d, r, c, origin=o)
            _, forces, _ = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna,
                                      cutoff, 0.4, 4.2, 1.8)
            return forces

        t = measure(step, dep, (pos,), iters=3)
        print(f"  D3+build {label}: {t*1e3:8.2f} ms", flush=True)
print("done", flush=True)
