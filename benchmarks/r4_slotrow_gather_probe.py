# SPDX-License-Identifier: Apache-2.0
"""Slot-row gather variants at the 262k cliff (round 4).

The grid build's slot materialization — ``svals[srcc]`` with monotone
``srcc`` — jumps from ~1.5 ms at 575k slots (132k atoms) to ~14 ms at
1.19M slots (262k atoms), a lowering cliff, not a traffic wall (the
traffic merely doubles).  Variants: the sorted-indices gather hint,
per-column 1-D gathers, and chunked gathers.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal, tuned_grid  # noqa: E402
from nvalchemiops_tpu.mathops.math import apply_mat3  # noqa: E402
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402

dep = perturb_positions()
_ = measure(lambda p: jnp.sum(p * p), dep,
            (jnp.zeros((8, 8), jnp.float32),), iters=8)

for n_rep in (51, 64, 80):
    dtype = jnp.float32
    pos_np, cell_np = crystal(n_rep, 3.0)
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pbc = np.array([True] * 3)
    dims, radius, cap, origin = tuned_grid(pos, cell, pbc, 4.5, n)
    cz, cy, cx = dims
    ncells = cz * cy * cx
    inv_cell = jnp.linalg.inv(cell)
    cpd_xyz = jnp.asarray([cx, cy, cz], INDEX_DTYPE)
    iota = jnp.arange(n, dtype=INDEX_DTYPE)
    print(f"N={n} dims={dims} cap={cap} slots={ncells*cap}", flush=True)

    def stage(p):
        frac = apply_mat3(p, inv_cell)
        bp = frac * cpd_xyz.astype(dtype)
        if origin is not None:
            bp = bp - origin.reshape(1, 3)
        coords = jnp.floor(bp).astype(INDEX_DTYPE)
        wrapped = coords - jnp.floor_divide(coords, cpd_xyz) * cpd_xyz
        lin = wrapped[:, 0] + cx * (wrapped[:, 1] + cy * wrapped[:, 2])
        sorted_lin, order, spx, spy, spz = jax.lax.sort(
            (lin, iota, p[:, 0], p[:, 1], p[:, 2]), num_keys=1,
            is_stable=True)
        counts = jnp.zeros((ncells,), INDEX_DTYPE).at[lin].add(1)
        starts = jnp.cumsum(counts) - counts
        src = starts[:, None] + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
        valid = src < (starts + counts)[:, None]
        srcc = jnp.where(valid, src, n).reshape(-1)
        return srcc, spx, spy, spz, order

    def g_current(p):
        srcc, spx, spy, spz, order = stage(p)
        svals = jnp.concatenate(
            [jnp.stack([spx, spy, spz, order.astype(dtype)], axis=-1),
             jnp.asarray([[0.0, 0.0, 0.0, float(n)]], dtype)], axis=0)
        return svals[srcc]

    def g_sorted_hint(p):
        srcc, spx, spy, spz, order = stage(p)
        svals = jnp.concatenate(
            [jnp.stack([spx, spy, spz, order.astype(dtype)], axis=-1),
             jnp.asarray([[0.0, 0.0, 0.0, float(n)]], dtype)], axis=0)
        return jnp.take(svals, srcc, axis=0, indices_are_sorted=True)

    def g_cols(p):
        srcc, spx, spy, spz, order = stage(p)
        outs = []
        for col, fill in ((spx, 0.0), (spy, 0.0), (spz, 0.0),
                          (order.astype(dtype), float(n))):
            cw = jnp.concatenate([col, jnp.asarray([fill], dtype)])
            outs.append(cw[srcc])
        return jnp.stack(outs, axis=-1)

    def g_cols_sorted(p):
        srcc, spx, spy, spz, order = stage(p)
        outs = []
        for col, fill in ((spx, 0.0), (spy, 0.0), (spz, 0.0),
                          (order.astype(dtype), float(n))):
            cw = jnp.concatenate([col, jnp.asarray([fill], dtype)])
            outs.append(jnp.take(cw, srcc, indices_are_sorted=True))
        return jnp.stack(outs, axis=-1)

    def g_chunked(p):
        srcc, spx, spy, spz, order = stage(p)
        svals = jnp.concatenate(
            [jnp.stack([spx, spy, spz, order.astype(dtype)], axis=-1),
             jnp.asarray([[0.0, 0.0, 0.0, float(n)]], dtype)], axis=0)
        k = 8
        m = srcc.shape[0]
        pad = (-m) % k
        s2 = jnp.pad(srcc, (0, pad)).reshape(k, -1)
        return jnp.stack([svals[s2[i]] for i in range(k)])

    for name, fn in (("svals[srcc] (current)", g_current),
                     ("take sorted hint", g_sorted_hint),
                     ("per-column", g_cols),
                     ("per-column sorted", g_cols_sorted),
                     ("chunked x8", g_chunked)):
        t = measure(fn, dep, (pos,), iters=4)
        print(f"  {name:22s}: {t*1e3:7.2f} ms", flush=True)
print("done", flush=True)

# round-4b: monotone-index and sorted-unique-scatter formulations
for n_rep in (64,):
    dtype = jnp.float32
    pos_np, cell_np = crystal(n_rep, 3.0)
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pbc = np.array([True] * 3)
    dims, radius, cap, origin = tuned_grid(pos, cell, pbc, 4.5, n)
    cz, cy, cx = dims
    ncells = cz * cy * cx
    inv_cell = jnp.linalg.inv(cell)
    cpd_xyz = jnp.asarray([cx, cy, cz], INDEX_DTYPE)
    iota = jnp.arange(n, dtype=INDEX_DTYPE)

    def stage2(p):
        frac = apply_mat3(p, inv_cell)
        bp = frac * cpd_xyz.astype(dtype)
        if origin is not None:
            bp = bp - origin.reshape(1, 3)
        coords = jnp.floor(bp).astype(INDEX_DTYPE)
        wrapped = coords - jnp.floor_divide(coords, cpd_xyz) * cpd_xyz
        lin = wrapped[:, 0] + cx * (wrapped[:, 1] + cy * wrapped[:, 2])
        sorted_lin, order, spx, spy, spz = jax.lax.sort(
            (lin, iota, p[:, 0], p[:, 1], p[:, 2]), num_keys=1,
            is_stable=True)
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_lin[1:] != sorted_lin[:-1]])
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(boundary, iota, 0))
        rank = iota - run_start
        counts = jnp.zeros((ncells,), INDEX_DTYPE).at[lin].add(1)
        starts = jnp.cumsum(counts) - counts
        return sorted_lin, rank, starts, counts, spx, spy, spz, order

    def g_unclamped_monotone(p):
        sorted_lin, rank, starts, counts, spx, spy, spz, order = stage2(p)
        svals = jnp.concatenate(
            [jnp.stack([spx, spy, spz, order.astype(dtype)], axis=-1),
             jnp.zeros((cap, 4), dtype)], axis=0)
        src = (starts[:, None]
               + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]).reshape(-1)
        out = jnp.take(svals, src, axis=0, indices_are_sorted=True)
        valid = (src < (starts + counts)[:, None].repeat(cap, 1).reshape(-1)
                 [0:0 + src.shape[0]])
        return jnp.where(valid[:, None], out, 0.0)

    def g_scatter_sorted(p):
        sorted_lin, rank, starts, counts, spx, spy, spz, order = stage2(p)
        dst = jnp.where(rank < cap, sorted_lin * cap + rank, ncells * cap)
        rows = jnp.stack([spx, spy, spz, order.astype(dtype)], axis=-1)
        planes = jnp.zeros((ncells * cap + 1, 4), dtype)
        planes = planes.at[dst].set(rows, indices_are_sorted=True,
                                    unique_indices=True)
        return planes

    for name, fn in (("unclamped monotone", g_unclamped_monotone),
                     ("scatter sorted-unique", g_scatter_sorted)):
        try:
            t = measure(fn, dep, (pos,), iters=4)
            print(f"  {name:22s}: {t*1e3:7.2f} ms", flush=True)
        except Exception as exc:
            print(f"  {name:22s}: FAILED {type(exc).__name__}: {exc}"[:200],
                  flush=True)
print("done2", flush=True)
