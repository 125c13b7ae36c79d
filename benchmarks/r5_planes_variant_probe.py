# SPDX-License-Identifier: Apache-2.0
"""Slot-plane materialization variants at the 8.49M-atom batch size.

r5_batchnl_probe stage breakdown: keys 0.7 / sort 24.1 / hist 60.1 /
planes 580.3 ms — the monotone slot-row take is ~520 ms of the 586 ms
fused batch build (and the same stage dominates the vmapped build).  At
262k atoms the same formulation measured ~7 ns/slot; here it reads ~26
ns/slot, so either the indices_are_sorted fast path is lost at this
shape or the row form lowers differently.  Measure the candidates:

  take_row    — current: [slots] row take from svals [n+cap, 4]
  take_flat   — 4 separate 1-D takes (no row dimension)
  take_perR   — cap x 4 takes of [ncells] at starts+r (indices reused)
  scatter_s   — monotone-unique scatter of the sorted payload to dests
  hist_scatter/hist_segsum/hist_bound — the counts/starts stage variants

Usage: nohup python benchmarks/r5_planes_variant_probe.py > log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal  # noqa: E402
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402
from nvalchemiops_tpu.mathops.math import apply_mat3  # noqa: E402

CUTOFF = 4.5
A = 3.0
B = int(os.environ.get("PROBE_BATCH_B", "64"))
nr = int(os.environ.get("PROBE_BATCH_NREP", "51"))

pos1, cell1 = crystal(nr, A)
npa = pos1.shape[0]
rng = np.random.default_rng(0)
pos_b_np = np.stack([pos1 + rng.uniform(-0.2, 0.2, pos1.shape)
                     for _ in range(B)])
pos_bs = jnp.asarray(pos_b_np, jnp.float32)
cell_j = jnp.asarray(cell1, jnp.float32)
dep = perturb_positions()

cx = cy = cz = 34
cap = 8
ncells = cx * cy * cz
cpd_xyz = jnp.asarray([cx, cy, cz], INDEX_DTYPE)
n_tot = B * npa
print(f"B={B} npa={npa} slots={B*ncells*cap/1e6:.1f}M", flush=True)


@jax.jit
def presort(positions):
    Bn, n, _ = positions.shape
    dtype = positions.dtype
    inv = jnp.linalg.inv(cell_j)
    frac = jax.vmap(lambda p: apply_mat3(p, inv))(positions)
    coords = jnp.floor(frac * cpd_xyz.astype(dtype)).astype(INDEX_DTYPE)
    wrap = jnp.floor_divide(coords, cpd_xyz)
    ccoords = coords - wrap * cpd_xyz
    shift_cart = jax.vmap(lambda a: apply_mat3(a, cell_j))(wrap.astype(dtype))
    wp = positions - shift_cart
    lin = (ccoords[..., 0] + cx * (ccoords[..., 1] + cy * ccoords[..., 2]))
    lin_g = (lin + jnp.arange(Bn, dtype=INDEX_DTYPE)[:, None] * ncells
             ).reshape(-1)
    iota = jnp.arange(Bn * n, dtype=INDEX_DTYPE)
    return jax.lax.sort(
        (lin_g, iota, wp[..., 0].reshape(-1), wp[..., 1].reshape(-1),
         wp[..., 2].reshape(-1)), num_keys=1, is_stable=True)


sorted_lin, order, spx, spy, spz = [np.asarray(a) for a in presort(pos_bs)]
lin_g_np = np.zeros(n_tot, np.int32)
lin_g_np[np.asarray(order)] = sorted_lin
base = {
    "sorted_lin": jnp.asarray(sorted_lin),
    "order": jnp.asarray(order),
    "spx": jnp.asarray(spx), "spy": jnp.asarray(spy),
    "spz": jnp.asarray(spz),
    "lin_g": jnp.asarray(lin_g_np),
}


def dep_mix(args, out):
    # mix the previous output into every input each fn might read, so no
    # iteration is loop-invariant (the harness rule: undepended work is
    # dead code XLA hoists or deletes)
    leaves = jax.tree_util.tree_leaves(out)
    h = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    eps = (jnp.abs(h) % 2.0) * 1e-30
    eps_i = eps.astype(INDEX_DTYPE)          # runtime 0, unprovable
    d = dict(args[0])
    d["spx"] = d["spx"] + eps
    d["lin_g"] = d["lin_g"] + eps_i
    d["sorted_lin"] = d["sorted_lin"] + eps_i
    return (d,)


NC = B * ncells


@jax.jit
def hist_scatter(d):
    counts = jnp.zeros((NC,), INDEX_DTYPE).at[d["lin_g"]].add(1)
    return jnp.cumsum(counts) - counts


@jax.jit
def hist_segsum(d):
    counts = jax.ops.segment_sum(
        jnp.ones((n_tot,), INDEX_DTYPE), d["sorted_lin"], num_segments=NC,
        indices_are_sorted=True)
    return jnp.cumsum(counts) - counts


@jax.jit
def hist_bound(d):
    sl = d["sorted_lin"]
    iota = jnp.arange(n_tot, dtype=INDEX_DTYPE)
    boundary = jnp.concatenate([jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    # first index of each occupied cell; empties take the NEXT cell's
    # start via a reversed cummin (fill = n_tot)
    starts0 = jnp.full((NC,), n_tot, INDEX_DTYPE).at[sl].min(
        jnp.where(boundary, iota, n_tot))
    rev = jax.lax.associative_scan(jnp.minimum, starts0[::-1])[::-1]
    return rev


def _starts_ends(d):
    starts = hist_scatter(d)
    counts = jnp.zeros((NC,), INDEX_DTYPE).at[d["lin_g"]].add(1)
    return starts, starts + counts


S_np, E_np = [np.asarray(a) for a in _starts_ends(base)]
starts_j = jnp.asarray(S_np)
ends_j = jnp.asarray(E_np)


@jax.jit
def take_row(d):
    src = starts_j[:, None] + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
    valid = src < ends_j[:, None]
    svals = jnp.concatenate(
        [jnp.stack([d["spx"], d["spy"], d["spz"],
                    d["order"].astype(jnp.float32)], axis=-1),
         jnp.zeros((cap, 4), jnp.float32)], axis=0)
    srcc = jnp.minimum(src, ends_j[:, None])
    planes = jnp.take(svals, srcc.reshape(-1), axis=0,
                      indices_are_sorted=True)
    planes = jnp.where(valid.reshape(-1, 1), planes,
                       jnp.asarray([[0.0, 0.0, 0.0, float(npa)]],
                                   jnp.float32))
    return planes.reshape(B, cz, cy, cx, cap, 4)[..., 0]


@jax.jit
def take_flat(d):
    src = starts_j[:, None] + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
    valid = src < ends_j[:, None]
    srcc = jnp.minimum(src, ends_j[:, None]).reshape(-1)
    outs = []
    for k in ("spx", "spy", "spz"):
        v = jnp.concatenate([d[k], jnp.zeros((cap,), jnp.float32)])
        outs.append(jnp.where(valid.reshape(-1),
                              jnp.take(v, srcc, indices_are_sorted=True),
                              0.0))
    return outs[0].reshape(B, cz, cy, cx, cap)


@jax.jit
def take_perR(d):
    outs = []
    for k in ("spx", "spy", "spz"):
        v = jnp.concatenate([d[k], jnp.zeros((cap,), jnp.float32)])
        cols = []
        for r in range(cap):
            src_r = jnp.minimum(starts_j + r, ends_j)
            cols.append(jnp.where(starts_j + r < ends_j,
                                  jnp.take(v, src_r,
                                           indices_are_sorted=True), 0.0))
        outs.append(jnp.stack(cols, axis=-1))
    return outs[0].reshape(B, cz, cy, cx, cap)


@jax.jit
def scatter_s(d):
    iota = jnp.arange(n_tot, dtype=INDEX_DTYPE)
    sl = d["sorted_lin"]
    boundary = jnp.concatenate([jnp.ones((1,), bool), sl[1:] != sl[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, iota, 0))
    rank = iota - run_start
    dest = jnp.where(rank < cap, sl * cap + rank, NC * cap)
    outs = []
    for k in ("spx", "spy", "spz"):
        buf = jnp.zeros((NC * cap + 1,), jnp.float32)
        outs.append(buf.at[dest].set(
            d[k], indices_are_sorted=True, unique_indices=True)[:-1])
    return outs[0].reshape(B, cz, cy, cx, cap)


measure(hist_scatter, dep_mix, (base,), iters=3)  # warmup throwaway
for name, fn in (("hist_scatter", hist_scatter),
                 ("hist_segsum", hist_segsum),
                 ("hist_bound", hist_bound),
                 ("take_row", take_row),
                 ("take_flat", take_flat),
                 ("take_perR", take_perR),
                 ("scatter_s", scatter_s)):
    try:
        t = measure(fn, dep_mix, (base,), iters=3)
        print(f"{name}: {t*1e3:.3f} ms", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{name} FAILED: {type(exc).__name__}: {exc}"[:200], flush=True)

# correctness cross-check of the fastest alternates vs take_row
pr = np.asarray(take_row(base))
for name, fn in (("take_flat", take_flat), ("take_perR", take_perR),
                 ("scatter_s", scatter_s)):
    alt = np.asarray(fn(base))
    print(f"{name} max|diff| vs take_row px: "
          f"{np.abs(alt - pr).max():.3e}", flush=True)
print("done", flush=True)
