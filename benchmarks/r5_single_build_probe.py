# SPDX-License-Identifier: Apache-2.0
"""Single-system build: slot-row take vs cap x per-rank 1-D takes.

The fused batch build won 3.6x by materializing slot planes as cap
per-rank [ncells] monotone takes instead of one [slots] row take
(r5_planes_variant_probe, 20.1M slots).  The single-system build still
uses the row take; r4_slotrow_gather_probe compared row-form variants
and per-column flat takes but never the per-rank form.  Measure the
full build both ways at the suite geometry (4.5 A) for 262k / 512k / 1M
atoms.

Usage: nohup python benchmarks/r5_single_build_probe.py > log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal, tuned_grid  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    batch_build_atom_grid, build_atom_grid,
)

CUTOFF = 4.5
dep = perturb_positions()
warmed = [False]

for nr in (int(s) for s in os.environ.get("PROBE_NREPS",
                                          "64,80,102").split(",")):
    pos_np, cell_np = crystal(nr, 3.0)
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, jnp.float32)
    cell = jnp.asarray(cell_np, jnp.float32)
    pbc = np.array([True] * 3)
    dims, radius, cap, origin = tuned_grid(pos, cell, pbc, CUTOFF, n)
    nslots = dims[0] * dims[1] * dims[2] * cap
    print(f"[n={n}] dims={dims} cap={cap} slots={nslots/1e6:.2f}M",
          flush=True)

    def row_step(p, _c=cell, _d=dims, _r=radius, _cap=cap, _o=origin):
        return build_atom_grid(p, _c, pbc, _d, _r, _cap, origin=_o).ext_px

    # the per-rank form IS batch_build_atom_grid with B=1 (identical
    # pipeline otherwise: same sort/histogram/halo)
    def perR_step(p, _c=cell, _d=dims, _r=radius, _cap=cap, _o=origin):
        return batch_build_atom_grid(p[None], _c, pbc, _d, _r, _cap,
                                     origin=_o).ext_px

    if not warmed[0]:
        measure(row_step, dep, (pos,), iters=3)
        warmed[0] = True
    t_row = measure(row_step, dep, (pos,), iters=3)
    t_perR = measure(perR_step, dep, (pos,), iters=3)
    print(f"[n={n}] row-take build {t_row*1e3:8.3f} ms | per-rank build "
          f"{t_perR*1e3:8.3f} ms", flush=True)
print("done", flush=True)
