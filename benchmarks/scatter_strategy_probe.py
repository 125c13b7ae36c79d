# SPDX-License-Identifier: Apache-2.0
"""Probe: slot-plane construction strategies for build_atom_grid at 524k.

build_stage_probe showed the 524k build is NOT sort-bound: bucket_ranks
costs 3.4 ms while the [N, 5] row scatter into slot space costs ~21 ms
of the 25.6 ms build (random destination indices force the conservative
XLA scatter lowering).  Candidate replacements, all producing the same
[ncells*cap, 5] planes:

A. current scatter but with per-atom-unique trash slots +
   ``unique_indices=True`` (skips duplicate-update serialization),
B. payload carried through the bucket sort, then scattered with
   monotone-per-cell destinations + ``unique_indices=True``,
C. scatter-free: payload through the sort, cell starts via searchsorted,
   one row GATHER from sorted payload with monotone source indices.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import build_atom_grid, choose_grid_geometry  # noqa: E402
from nvalchemiops_tpu.mathops.math import apply_mat3  # noqa: E402
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402

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
cz, cy, cx = dims
ncells = cz * cy * cx
n = pos.shape[0]
print(f"N={n} dims={dims} cap={cap} ncells={ncells}", flush=True)
dep = perturb_positions()

inv_cell = jnp.linalg.inv(cell)
cpd_xyz = jnp.asarray([cx, cy, cz], INDEX_DTYPE)


def prep(p):
    frac = apply_mat3(p, inv_cell)
    bp = frac * cpd_xyz.astype(dtype)
    if origin is not None:
        bp = bp - origin.reshape(1, 3)
    coords = jnp.floor(bp).astype(INDEX_DTYPE)
    wrapped = coords - jnp.floor_divide(coords, cpd_xyz) * cpd_xyz
    lin = wrapped[:, 0] + cx * (wrapped[:, 1] + cy * wrapped[:, 2])
    return lin


iota = jnp.arange(n, dtype=INDEX_DTYPE)


def sort_rank(lin):
    sorted_lin, order = jax.lax.sort((lin, iota), num_keys=1, is_stable=True)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_lin[1:] != sorted_lin[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, iota, 0))
    return sorted_lin, order, iota - run_start


def vals_of(p):
    return jnp.stack([p[:, 0], p[:, 1], p[:, 2],
                      jnp.ones((n,), dtype), iota.astype(dtype)], axis=-1)


# A. original-order scatter, unique trash slots, unique_indices=True
def strat_a(p):
    lin = prep(p)
    _, order, rank_sorted = sort_rank(lin)
    rank = jnp.zeros((n,), INDEX_DTYPE).at[order].set(rank_sorted)
    flat = jnp.where(rank >= cap, ncells * cap + iota, lin * cap + rank)
    fill_row = jnp.asarray([0.0, 0.0, 0.0, 0.0, float(n)], dtype)
    buf = jnp.broadcast_to(fill_row, (ncells * cap + n, 5))
    return buf.at[flat].set(vals_of(p), unique_indices=True)[:ncells * cap]


# B. payload through the sort; sorted-space scatter, unique_indices=True
def strat_b(p):
    lin = prep(p)
    sorted_lin, order, spx, spy, spz = jax.lax.sort(
        (lin, iota, p[:, 0], p[:, 1], p[:, 2]), num_keys=1, is_stable=True)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_lin[1:] != sorted_lin[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, iota, 0))
    rank_sorted = iota - run_start
    slot = jnp.where(rank_sorted >= cap, ncells * cap + iota,
                     sorted_lin * cap + rank_sorted)
    vals = jnp.stack([spx, spy, spz, jnp.ones((n,), dtype),
                      order.astype(dtype)], axis=-1)
    fill_row = jnp.asarray([0.0, 0.0, 0.0, 0.0, float(n)], dtype)
    buf = jnp.broadcast_to(fill_row, (ncells * cap + n, 5))
    return buf.at[slot].set(vals, unique_indices=True)[:ncells * cap]


# C. scatter-free: searchsorted starts + one monotone row gather
def strat_c(p):
    lin = prep(p)
    sorted_lin, order, spx, spy, spz = jax.lax.sort(
        (lin, iota, p[:, 0], p[:, 1], p[:, 2]), num_keys=1, is_stable=True)
    starts = jnp.searchsorted(sorted_lin, jnp.arange(ncells, dtype=INDEX_DTYPE))
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], INDEX_DTYPE)])
    src = starts[:, None] + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
    valid = src < ends[:, None]
    srcc = jnp.where(valid, src, n)
    svals = jnp.stack([spx, spy, spz, jnp.ones((n,), dtype),
                       order.astype(dtype)], axis=-1)
    fill_row = jnp.asarray([0.0, 0.0, 0.0, 0.0, float(n)], dtype)
    svals = jnp.concatenate([svals, fill_row[None]], axis=0)
    return svals[srcc.reshape(-1)]


# C2. like C but 5 separate 1-D gathers (row gather vs column gathers)
def strat_c2(p):
    lin = prep(p)
    sorted_lin, order, spx, spy, spz = jax.lax.sort(
        (lin, iota, p[:, 0], p[:, 1], p[:, 2]), num_keys=1, is_stable=True)
    starts = jnp.searchsorted(sorted_lin, jnp.arange(ncells, dtype=INDEX_DTYPE))
    ends = jnp.concatenate([starts[1:], jnp.asarray([n], INDEX_DTYPE)])
    src = starts[:, None] + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
    valid = src < ends[:, None]
    srcc = jnp.where(valid, src, n).reshape(-1)
    outs = []
    for col, fill in ((spx, 0.0), (spy, 0.0), (spz, 0.0),
                      (order.astype(dtype), float(n))):
        padded = jnp.concatenate([col, jnp.asarray([fill], dtype)])
        outs.append(padded[srcc])
    return outs[0] + outs[1] + outs[2] + outs[3] + valid.reshape(-1)


# reference: the current build (scatter path) for parity + baseline
t = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                      origin=origin), dep, (pos,), iters=4)
print(f"full build (current) : {t*1e3:7.2f} ms", flush=True)

for name, fn in (("A unique-scatter", strat_a), ("B sorted-scatter", strat_b),
                 ("C row-gather", strat_c), ("C2 col-gathers", strat_c2)):
    try:
        t = measure(fn, dep, (pos,), iters=4)
        print(f"{name:20s} : {t*1e3:7.2f} ms", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{name:20s} : failed {type(exc).__name__}: {exc}"[:200],
              flush=True)

# parity A vs B vs C (same slot planes; aid column identifies the atom)
pa = np.asarray(strat_a(pos))
pb = np.asarray(strat_b(pos))
pc = np.asarray(strat_c(pos))
print(f"A-vs-B max |diff|: {np.abs(pa - pb).max():.3e}", flush=True)
print(f"A-vs-C max |diff|: {np.abs(pa - pc).max():.3e}", flush=True)
print("done", flush=True)
