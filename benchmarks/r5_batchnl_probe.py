# SPDX-License-Identifier: Apache-2.0
"""Stage probe + fix measurement for the 8.49M-atom batch NL build.

Round-4 VERDICT weak #2 / next-round task #1: batch-grid-build at
64 x 132,651 atoms measured 928.8 ms (0.109 us/atom) vs the H100 batch
cell list at 300.2 ms — while the library's own single-system builds run
at 0.018-0.045 us/atom, so the deficit is formulation (the vmapped
per-system build), not a hardware floor.

This probe measures the new fused ``batch_build_atom_grid`` (one global
compound-key sort + flat histogram + globally monotone slot-row take)
against the vmapped build, with a stage breakdown of the fused path:

  keys   — binning + compound linearization only
  sort   — + the 5-operand payload sort
  hist   — + histogram / cumsum / run bookkeeping
  planes — + slot-row take and park (pre-halo)
  full   — the complete builder (halo extension + shifts)

Usage: nohup python benchmarks/r5_batchnl_probe.py > /tmp/r5bnl.log 2>&1 &
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    batch_build_atom_grid,
    build_atom_grid,
    estimate_grid_geometry,
)
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
pbc = np.array([True] * 3)
dep = perturb_positions()

dims, radius, cap = estimate_grid_geometry(
    cell1, pbc, CUTOFF, npa, target_occupancy=0.6)
# tight capacity from observed occupancy, as the r4 probe did
g0 = batch_build_atom_grid(pos_bs[:2], cell_j, pbc, dims, radius, cap)
occ = int(jnp.max(g0.counts_max))
cap = int(np.ceil(max(occ, 1) / 8)) * 8
del g0
print(f"batch: B={B} npa={npa} total={B*npa} dims={dims} cap={cap}",
      flush=True)

cz, cy, cx = dims
ncells = cx * cy * cz
cpd_xyz = jnp.asarray([cx, cy, cz], INDEX_DTYPE)


def stage(depth):
    """Fused-path prefix up to ``depth`` (keys/sort/hist/planes)."""

    @jax.jit
    def fn(positions):
        Bn, n, _ = positions.shape
        dtype = positions.dtype
        inv = jnp.linalg.inv(cell_j)
        frac = jax.vmap(lambda p: apply_mat3(p, inv))(positions)
        coords = jnp.floor(frac * cpd_xyz.astype(dtype)).astype(INDEX_DTYPE)
        wrap = jnp.floor_divide(coords, cpd_xyz)
        ccoords = coords - wrap * cpd_xyz
        shift_cart = jax.vmap(lambda a: apply_mat3(a, cell_j))(
            wrap.astype(dtype))
        wpx = (positions[..., 0] - shift_cart[..., 0]).reshape(-1)
        wpy = (positions[..., 1] - shift_cart[..., 1]).reshape(-1)
        wpz = (positions[..., 2] - shift_cart[..., 2]).reshape(-1)
        lin = (ccoords[..., 0] + cx * (ccoords[..., 1] + cy * ccoords[..., 2]))
        lin_g = (lin + jnp.arange(Bn, dtype=INDEX_DTYPE)[:, None] * ncells
                 ).reshape(-1)
        if depth == "keys":
            return lin_g
        n_tot = Bn * n
        iota = jnp.arange(n_tot, dtype=INDEX_DTYPE)
        sorted_lin, order, spx, spy, spz = jax.lax.sort(
            (lin_g, iota, wpx, wpy, wpz), num_keys=1, is_stable=True)
        if depth == "sort":
            return sorted_lin
        counts = jnp.zeros((Bn * ncells,), INDEX_DTYPE).at[lin_g].add(1)
        starts = jnp.cumsum(counts) - counts
        if depth == "hist":
            return starts
        src = starts[:, None] + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
        valid = src < (starts + counts)[:, None]
        svals = jnp.concatenate(
            [jnp.stack([spx, spy, spz, order.astype(dtype)], axis=-1),
             jnp.zeros((cap, 4), dtype)], axis=0)
        srcc = jnp.minimum(src, (starts + counts)[:, None])
        planes = jnp.take(svals, srcc.reshape(-1), axis=0,
                          indices_are_sorted=True)
        planes = jnp.where(valid.reshape(-1, 1), planes,
                           jnp.asarray([[0.0, 0.0, 0.0, float(n)]], dtype))
        return planes.reshape(Bn, cz, cy, cx, cap, 4)[..., 0]

    return fn


# throwaway warmup (first measure of a process reads high)
measure(stage("keys"), dep, (pos_bs,), iters=3)

for depth in ("keys", "sort", "hist", "planes"):
    t = measure(stage(depth), dep, (pos_bs,), iters=3)
    print(f"stage[{depth}]: {t*1e3:.3f} ms", flush=True)


def fused_step(p):
    g = batch_build_atom_grid(p, cell_j, pbc, dims, radius, cap)
    return g.ext_px

t_f = measure(fused_step, dep, (pos_bs,), iters=3)
print(f"fused batch_build_atom_grid {B}x{npa}: {t_f*1e3:.3f} ms "
      f"({t_f*1e6/(B*npa):.4f} us/atom)", flush=True)

if os.environ.get("PROBE_VMAP", "0") == "1":
    def vmap_step(p):
        g = jax.vmap(lambda pp: build_atom_grid(
            pp, cell_j, pbc, dims, radius, cap))(p)
        return g.ext_px

    t_v = measure(vmap_step, dep, (pos_bs,), iters=3)
    print(f"vmapped build {B}x{npa}: {t_v*1e3:.3f} ms "
          f"({t_v*1e6/(B*npa):.4f} us/atom)", flush=True)

print("done", flush=True)
