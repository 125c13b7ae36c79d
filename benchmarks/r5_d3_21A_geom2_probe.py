# SPDX-License-Identifier: Apache-2.0
"""Flagship 21.2 A config: explicit dims sweep around the cost-model pick.

choose_grid_geometry picked (12,12,6)/cap 112 -> 23.4 ms D3.  Probe
nearby anisotropic candidates outside its generator to see if a better
partition exists (if one wins >10%, extend the generator).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import (  # noqa: E402
    D3_A1, D3_A2, D3_S8, build_system,
)
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid, choose_grid_geometry, choose_grid_origin,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements, grid_dftd3,
)

CUTOFF = 21.2
(pos_np, cell_np, numbers_np, _q, rcov_np, r4r2_np, cna_np,
 c6_np) = build_system(n_rep=35)
n = pos_np.shape[0]
numbers, rcov, r4r2, c6, cna = compact_d3_elements(
    numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(cell_np, jnp.float32)
pbc = np.array([True] * 3)
tabs = tuple(jnp.asarray(a, jnp.float32) for a in (rcov, r4r2, c6, cna))
dep = perturb_positions()
warmed = [False]

CANDS = [(12, 12, 6), (13, 13, 6), (14, 14, 6), (12, 12, 7),
         (12, 12, 5), (10, 10, 6), (13, 13, 7), (16, 16, 6),
         (12, 12, 12), (13, 13, 13)]

for dims in CANDS:
    try:
        d, r, cap, origin_np = choose_grid_geometry(
            pos, cell, pbc, CUTOFF, dims_candidates=[dims])
        if tuple(d) != tuple(dims):
            print(f"{dims}: generator overrode to {d}; forcing", flush=True)
        # force the candidate: geometry pieces computed directly
        cpd = np.array([dims[2], dims[1], dims[0]], np.int64)
        face = np.array([cell_np[0, 0], cell_np[1, 1], cell_np[2, 2]])
        radius = tuple(int(v) for v in np.ceil(
            CUTOFF * cpd / face).astype(int)[::-1])
        origin_np2, occ = choose_grid_origin(pos, cell, pbc, dims)
        cap = int(np.ceil((occ + 1) / 8)) * 8
        origin = (jnp.asarray(origin_np2, jnp.float32)
                  if np.any(origin_np2 != 0.0) else None)

        def d3_step(p, _d=dims, _r=radius, _cap=cap, _o=origin):
            gg = build_atom_grid(p, cell, pbc, _d, _r, _cap, origin=_o)
            return grid_dftd3(gg, numbers, *tabs, CUTOFF,
                              D3_A1, D3_A2, D3_S8, engine="window")

        def b_step(p, _d=dims, _r=radius, _cap=cap, _o=origin):
            return build_atom_grid(p, cell, pbc, _d, _r, _cap,
                                   origin=_o).ext_px

        if not warmed[0]:
            measure(b_step, dep, (pos,), iters=4)
            warmed[0] = True
        t_b = measure(b_step, dep, (pos,), iters=4)
        t = measure(d3_step, dep, (pos,), iters=3)
        print(f"dims={dims} radius={radius} cap={cap}: D3 "
              f"{(t-t_b)*1e3:8.2f} ms (build {t_b*1e3:.2f})", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"dims={dims} FAILED {type(exc).__name__}: {exc}"[:250],
              flush=True)
print("done", flush=True)
