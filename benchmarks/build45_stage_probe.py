# SPDX-License-Identifier: Apache-2.0
"""Probe: 512k grid-build stages at the NL benchmark geometry (4.5 A).

The cell-list benchmark config (a=3.0 crystal, 4.5 A cutoff -> 53^3
cells, cap 16, 2.4M slots) measures 34.9 ms while the 9.6 A/26^3/cap-40
geometry builds in 10.4 ms at the same atom count — and the scatter vs
gather choice barely moves it, so the cost lives elsewhere.  Stage
decomposition + alternatives for the many-cells regime.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal, tuned_grid  # noqa: E402
from nvalchemiops_tpu.grid import build_atom_grid  # noqa: E402
from nvalchemiops_tpu.mathops.math import apply_mat3  # noqa: E402
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402

N_REP = int(os.environ.get("PROBE_NREP", "80"))
CUTOFF = float(os.environ.get("PROBE_CUTOFF", "4.5"))
dtype = jnp.float32
pos_np, cell_np = crystal(N_REP, 3.0)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, dtype)
cell = jnp.asarray(cell_np, dtype)
pbc = np.array([True] * 3)
dims, radius, cap, origin = tuned_grid(pos, cell, pbc, CUTOFF, n)
cz, cy, cx = dims
ncells = cz * cy * cx
print(f"N={n} dims={dims} cap={cap} slots={ncells*cap}", flush=True)
dep = perturb_positions()

inv_cell = jnp.linalg.inv(cell)
cpd_xyz = jnp.asarray([cx, cy, cz], INDEX_DTYPE)
iota = jnp.arange(n, dtype=INDEX_DTYPE)


def lin_of(p):
    frac = apply_mat3(p, inv_cell)
    bp = frac * cpd_xyz.astype(dtype)
    if origin is not None:
        bp = bp - origin.reshape(1, 3)
    coords = jnp.floor(bp).astype(INDEX_DTYPE)
    wrapped = coords - jnp.floor_divide(coords, cpd_xyz) * cpd_xyz
    return wrapped[:, 0] + cx * (wrapped[:, 1] + cy * wrapped[:, 2])


t = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                      origin=origin), dep, (pos,), iters=4)
print(f"full build            : {t*1e3:7.2f} ms", flush=True)

t = measure(lambda p: lin_of(p), dep, (pos,), iters=4)
print(f"lin only              : {t*1e3:7.2f} ms", flush=True)


def sort5(p):
    lin = lin_of(p)
    return jax.lax.sort((lin, iota, p[:, 0], p[:, 1], p[:, 2]),
                        num_keys=1, is_stable=True)[0]


t = measure(sort5, dep, (pos,), iters=4)
print(f"5-operand sort        : {t*1e3:7.2f} ms", flush=True)


def sort2(p):
    lin = lin_of(p)
    return jax.lax.sort((lin, iota), num_keys=1, is_stable=True)[0]


t = measure(sort2, dep, (pos,), iters=4)
print(f"2-operand sort        : {t*1e3:7.2f} ms", flush=True)


def packed_sort(p):
    # lin * n + iota fits int32 only when ncells * n < 2^31 — here it
    # does NOT (149k * 512k), so pack lin with a per-cell rank bound
    # instead: sort float32 keys lin + iota/n in [0, ncells)
    lin = lin_of(p)
    key = lin.astype(jnp.float32) + iota.astype(jnp.float32) * (1.0 / n)
    return jnp.sort(key)


t = measure(packed_sort, dep, (pos,), iters=4)
print(f"f32-packed 1-op sort  : {t*1e3:7.2f} ms", flush=True)


def searchsorted_stage(p):
    s = sort2(p)
    return jnp.searchsorted(s, jnp.arange(ncells, dtype=INDEX_DTYPE))


t = measure(searchsorted_stage, dep, (pos,), iters=4)
print(f"sort2 + searchsorted  : {t*1e3:7.2f} ms", flush=True)


def histo_starts(p):
    # searchsorted-free: per-cell counts by scatter-add, starts by cumsum
    lin = lin_of(p)
    counts = jnp.zeros((ncells,), INDEX_DTYPE).at[lin].add(1)
    return jnp.cumsum(counts) - counts


t = measure(histo_starts, dep, (pos,), iters=4)
print(f"lin + histo starts    : {t*1e3:7.2f} ms", flush=True)


def gather_stage(p):
    lin = lin_of(p)
    sorted_lin, order, spx, spy, spz = jax.lax.sort(
        (lin, iota, p[:, 0], p[:, 1], p[:, 2]), num_keys=1, is_stable=True)
    starts = jnp.searchsorted(sorted_lin,
                              jnp.arange(ncells, dtype=INDEX_DTYPE))
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], INDEX_DTYPE)])
    src = starts[:, None] + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
    valid = src < ends[:, None]
    srcc = jnp.where(valid, src, n).reshape(-1)
    svals = jnp.concatenate(
        [jnp.stack([spx, spy, spz, order.astype(dtype)], axis=-1),
         jnp.asarray([[0.0, 0.0, 0.0, float(n)]], dtype)], axis=0)
    return svals[srcc]


t = measure(gather_stage, dep, (pos,), iters=4)
print(f"sort5+starts+gather   : {t*1e3:7.2f} ms", flush=True)
print("done", flush=True)
