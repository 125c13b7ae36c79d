# SPDX-License-Identifier: Apache-2.0
"""Probe: per-atom property planes via row scatter vs aid row gather (524k).

scatter_rows_to_grid pays the same random-destination XLA scatter cost the
grid build used to (scatter_strategy_probe: 21 ms at 524k for the [N, 5]
build scatter vs 6.6 ms for the gather formulation).  Property planes can
be built the gather way with zero new grid state: the interior aid plane
already maps slot -> atom (trash slots -> n), so
``concat(values, fill_row)[aid_flat]`` is one [slots] row gather.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    _interior, build_atom_grid, choose_grid_geometry, scatter_rows_to_grid,
)

N_REP = int(os.environ.get("PROBE_NREP", "64"))
dtype = jnp.float32
pos_np, cell_np, *_ = build_system(n_rep=N_REP)
pos = jnp.asarray(pos_np, dtype)
cell = jnp.asarray(cell_np, dtype)
pbc = np.array([True] * 3)
cutoff = 9.6
dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
origin = (jnp.asarray(origin_np, dtype)
          if origin_np is not None and np.asarray(origin_np).any() else None)
n = pos.shape[0]
cz, cy, cx = dims
print(f"N={n} dims={dims} cap={cap}", flush=True)
dep = perturb_positions()

g = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)
rng = np.random.default_rng(1)
cols = [jnp.asarray(rng.normal(size=n), dtype) for _ in range(4)]

t = measure(lambda c0: scatter_rows_to_grid(g, (c0, *cols[1:]))[0],
            dep, (cols[0],), iters=4)
print(f"row scatter (k=4)    : {t*1e3:7.2f} ms", flush=True)


def via_aid(c0):
    vals = jnp.stack([c0, *cols[1:]], axis=-1)
    padded = jnp.concatenate(
        [vals, jnp.zeros((1, vals.shape[1]), dtype)], axis=0)
    aid = _interior(g, g.ext_aid).reshape(-1)
    planes = padded[aid].reshape(cz, cy, cx, cap, 4)
    return planes[..., 0]


t = measure(via_aid, dep, (cols[0],), iters=4)
print(f"aid row gather (k=4) : {t*1e3:7.2f} ms", flush=True)

a = np.asarray(scatter_rows_to_grid(g, cols)[2])
b = np.asarray(via_aid(cols[0]))
c = np.asarray(scatter_rows_to_grid(g, cols)[0])
print(f"parity col0: {np.abs(b - c).max():.3e}", flush=True)

# also: the full-build timing with the new gather formulation
t = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                      origin=origin), dep, (pos,), iters=4)
print(f"full build (gather)  : {t*1e3:7.2f} ms", flush=True)
print("done", flush=True)
