# SPDX-License-Identifier: Apache-2.0
"""Probe: stage decomposition of build_atom_grid at 524k atoms.

The 524k grid build costs ~25 ms vs the H100 cell-list 18.44 ms
(BASELINE.md); this probe splits it into binning (bucket_ranks sort),
the stacked row scatter, and the halo extension, and times sort-strategy
alternatives for the >2^31 packed-key regime:

- two-operand int32 lax.sort (current fallback),
- single-operand packed int64 sort,
- chunked int32 packed sorts + per-chunk histogram merge.
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
from nvalchemiops_tpu.neighborlist.neighbor_utils import bucket_ranks  # noqa: E402
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


def lin_of(p):
    frac = apply_mat3(p, inv_cell)
    bp = frac * cpd_xyz.astype(dtype)
    if origin is not None:
        bp = bp - origin.reshape(1, 3)
    coords = jnp.floor(bp).astype(INDEX_DTYPE)
    wrapped = coords - jnp.floor_divide(coords, cpd_xyz) * cpd_xyz
    return wrapped[:, 0] + cx * (wrapped[:, 1] + cy * wrapped[:, 2])


# full build (reference point)
t = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                      origin=origin), dep, (pos,), iters=4)
print(f"full build           : {t*1e3:7.2f} ms", flush=True)

# binning only (current bucket_ranks fallback)
t = measure(lambda p: bucket_ranks(lin_of(p), ncells)[0], dep, (pos,),
            iters=4)
print(f"bucket_ranks (2-op)  : {t*1e3:7.2f} ms", flush=True)


def ranks_from(sorted_lin, order):
    idx = jnp.arange(n, dtype=INDEX_DTYPE)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_lin[1:] != sorted_lin[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, idx, 0))
    rank_sorted = idx - run_start
    return jnp.zeros((n,), INDEX_DTYPE).at[order].set(rank_sorted)


# int64 single-key packed sort
def ranks_i64(p):
    lin = lin_of(p)
    key = jnp.sort(lin.astype(jnp.int64) * n
                   + jnp.arange(n, dtype=jnp.int64))
    sorted_lin = (key // n).astype(INDEX_DTYPE)
    order = (key - (key // n) * n).astype(INDEX_DTYPE)
    return ranks_from(sorted_lin, order)

try:
    t = measure(ranks_i64, dep, (pos,), iters=4)
    print(f"packed int64 sort    : {t*1e3:7.2f} ms", flush=True)
except Exception as exc:  # noqa: BLE001
    print(f"packed int64 sort    : failed {type(exc).__name__}: {exc}"[:200],
          flush=True)


# chunked int32 packed sorts + histogram merge
def ranks_chunked(p, n_chunks):
    lin = lin_of(p)
    m = n // n_chunks
    lin_c = lin.reshape(n_chunks, m)
    key = jnp.sort(lin_c * m + jnp.arange(m, dtype=INDEX_DTYPE)[None, :],
                   axis=1)
    sorted_lin = key // m                        # [C, m]
    order = key - sorted_lin * m                 # [C, m] (within-chunk)
    idx = jnp.arange(m, dtype=INDEX_DTYPE)[None, :]
    boundary = jnp.concatenate(
        [jnp.ones((n_chunks, 1), bool), sorted_lin[:, 1:] != sorted_lin[:, :-1]],
        axis=1)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, idx, 0), axis=1)
    rank_in_chunk = idx - run_start              # [C, m]
    # per-chunk histogram: scatter-add ones into [C, ncells]
    hist = jnp.zeros((n_chunks, ncells), INDEX_DTYPE).at[
        jnp.arange(n_chunks, dtype=INDEX_DTYPE)[:, None], sorted_lin
    ].add(1)
    offs = jnp.concatenate(
        [jnp.zeros((1, ncells), INDEX_DTYPE), jnp.cumsum(hist, 0)[:-1]], 0)
    # per-atom offset gather (sorted order), then scatter ranks back
    off_sorted = offs[jnp.arange(n_chunks)[:, None], sorted_lin]
    rank_sorted = rank_in_chunk + off_sorted
    flat_order = order + m * jnp.arange(n_chunks, dtype=INDEX_DTYPE)[:, None]
    return jnp.zeros((n,), INDEX_DTYPE).at[flat_order.reshape(-1)].set(
        rank_sorted.reshape(-1))

for n_chunks in (8, 16, 32):
    if n % n_chunks:
        continue
    try:
        t = measure(lambda p, c=n_chunks: ranks_chunked(p, c), dep, (pos,),
                    iters=4)
        print(f"chunked sort C={n_chunks:3d}   : {t*1e3:7.2f} ms", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"chunked sort C={n_chunks:3d}   : failed "
              f"{type(exc).__name__}: {exc}"[:200], flush=True)

# parity of the strategies
lin = lin_of(pos)
r_ref, _ = bucket_ranks(lin, ncells)
r_64 = ranks_i64(pos)
print(f"int64 parity  : {int(jnp.sum(r_64 != r_ref))} mismatches", flush=True)
for n_chunks in (16,):
    r_ch = ranks_chunked(pos, n_chunks)
    # chunked ranks permute within cells (chunk-major instead of global
    # index order) but must be a valid 0..count-1 ranking per cell
    ok_range = bool(jnp.all(r_ch >= 0))
    slot = lin * (cap + 64) + jnp.minimum(r_ch, cap + 63)
    uniq = jnp.unique(jax.device_get(slot)).size == n
    print(f"chunked C={n_chunks} valid : nonneg={ok_range} unique={uniq}",
          flush=True)


# stacked scatter alone
def scatter_only(p):
    lin = lin_of(p)
    rank, _ = bucket_ranks(lin, ncells)
    flat = jnp.where(rank >= cap, ncells * cap, lin * cap + rank)
    vals = jnp.stack([p[:, 0], p[:, 1], p[:, 2],
                      jnp.ones((n,), dtype),
                      jnp.arange(n, dtype=dtype)], axis=-1)
    fill_row = jnp.asarray([0.0, 0.0, 0.0, 0.0, float(n)], dtype)
    buf = jnp.broadcast_to(fill_row, (ncells * cap + 1, 5))
    return buf.at[flat].set(vals)[:-1]

t_sc = measure(scatter_only, dep, (pos,), iters=4)
print(f"bin+scatter          : {t_sc*1e3:7.2f} ms", flush=True)
print("done", flush=True)
