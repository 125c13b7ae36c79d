# SPDX-License-Identifier: Apache-2.0
"""Spatially-windowed B-spline spread/gather: the at-scale TPU fast path.

The dense separable formulation (spline.py:_separable_spread, reference
kernels spline.py:496-760) contracts every atom against *full* mesh axes —
``[N, nx] x [N, ny*nz]`` — which costs ``N * nx * ny * nz`` MXU flops (464
GFLOP at 110k atoms on a 128^3 mesh) for what is logically an order^3 = 64
point stencil per atom.  This module exploits spatial locality instead:

1. **Tile binning** (one payload-carrying bucket sort + a monotone row
   gather, the same build as ``grid.AtomGrid``): atoms are bucketed by the
   mesh tile (``T^3`` mesh points, default T=8) containing their stencil
   *base* index, stored as fixed-capacity slot planes ``[ntiles, cap]``.
2. **Local axis matrices**: each atom's order-point 1-D stencil lands in a
   window of ``W = T + 4`` mesh points per axis anchored at ``tile*T - 1``
   (stencil offsets lie in [-1, 2] for orders <= 4), so the dense per-axis
   weight matrices are tiny ``[cap, W]`` blocks instead of ``[N, n_axis]``
   — all six (weights + derivatives) live in one ``[ntiles, cap, 6W]``
   buffer filled by a single slot->atom row gather.
3. **Per-tile separable contraction** on the MXU:
   ``window[t, wz, (wy,wx)] = qS_z[t]^T ... (S_y (x) S_x)[t]`` — ~1 GFLOP
   total at the same size, a 450x flop reduction.  The ``(x)`` products are
   built with constant one-hot matmuls so no intermediate ever carries a
   TPU-hostile trailing dim (the (8,128) tiling pads a trailing 12 by 10x).
4. **Parity fold**: windows (stride T, width W <= 2T) overlap their
   neighbors, so even/odd tiles fold with pure pad/reshape/adds (no
   scatter); the fold chain is ordered z -> y -> x so every relayout keeps
   the last two dims fat (>= 128 lanes).
5. **Gather** extracts windows with whole-slab ``take`` (read-only overlap
   is fine) through the mirror-image chain; the energy gather and the three
   force-gradient gathers share the extraction, the tile structure, and the
   z-projection, which is what makes spline-derivative PME forces (one
   ``irfftn``) beat the reference's ik-space path (three ``irfftn``s + a
   separate vec3 gather; reference pme.py:1450-1477).

All ops are dense XLA (bucket sort, row gathers, matmuls, reshapes): the
path jits, differentiates, and runs identically on CPU and TPU.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from nvalchemiops_tpu.mathops.math import apply_mat3
from nvalchemiops_tpu.types import INDEX_DTYPE
from nvalchemiops_tpu.spline import bspline_weight, bspline_derivative

__all__ = [
    "windowed_applicable",
    "mesh_tile_capacity",
    "observed_tile_capacity",
    "build_mesh_tiles",
    "mesh_tiles_need_rebuild",
    "refresh_mesh_tiles",
    "windowed_spread",
    "windowed_gather",
    "MeshTiles",
]

_HALO_LEFT = 1   # stencil offsets reach base - 1 for orders 3-4
_HALO_RIGHT = 3  # and base + 2; window width = T + 4


def windowed_applicable(mesh_dims, spline_order: int, tile: int = 8) -> bool:
    """True when the windowed path supports this configuration."""
    return (
        1 <= spline_order <= 4
        and all(int(d) % tile == 0 for d in mesh_dims)
        and all(int(d) >= tile for d in mesh_dims)
    )


def mesh_tile_capacity(num_atoms: int, mesh_dims, tile: int = 8) -> int:
    """Static per-tile slot capacity (Poisson-safe, multiple of 8)."""
    ntiles = int(np.prod([int(d) // tile for d in mesh_dims]))
    occ = num_atoms / max(ntiles, 1)
    cap = occ + 6.0 * np.sqrt(occ + 4.0)
    return max(int(np.ceil(cap / 8.0)) * 8, 16)


def observed_tile_capacity(positions, cell, mesh_dims, tile: int = 8,
                           spline_order: int = 4) -> int:
    """Tile capacity from the *observed* max occupancy (one host sync).

    Every per-tile contraction scales ~cap, and near-crystalline systems
    sit far below the Poisson-safe bound (bench crystal: 32 observed vs
    64 estimated, halving the windowed spread/gather cost).  One-slot
    headroom rounded to a multiple of 8; the windowed path's dense
    fallback still guards overflow if atoms move.
    """
    dtype = positions.dtype
    nx, ny, nz = (int(d) for d in mesh_dims)
    dims_f = jnp.asarray([nx, ny, nz], dtype)
    inv = jnp.linalg.inv(jnp.asarray(cell, dtype=dtype).reshape(3, 3))

    @jax.jit
    def occ():
        mc = apply_mat3(positions, inv) * dims_f
        mc = mc - jnp.floor(mc / dims_f) * dims_f
        mc = jnp.where(mc >= dims_f, 0.0, mc)
        theta = mc - jnp.floor(mc)
        base = jnp.floor(mc).astype(INDEX_DTYPE)
        offset_start = jnp.floor(
            theta - (spline_order - 2) * 0.5).astype(INDEX_DTYPE)
        del offset_start  # base tile is independent of the stencil start
        t = base // tile
        ntx, nty, ntz = nx // tile, ny // tile, nz // tile
        lin = (t[:, 0] * nty + t[:, 1]) * ntz + t[:, 2]
        counts = jnp.zeros((ntx * nty * ntz,), INDEX_DTYPE).at[lin].add(1)
        return jnp.max(counts)

    observed = int(jax.device_get(occ()))
    # headroom matters: a razor-thin cap (observed+1) lets small position
    # perturbations overflow one tile and trip the expensive dense
    # fallback (measured 18.7 ms vs 11.9 at cap=observed+1 on the bench
    # crystal); +2 slots then round to 8, at least +5%
    return max(int(np.ceil((observed + 2) / 8)) * 8,
               int(np.ceil(observed * 1.05 / 8)) * 8, 8)


@jax.tree_util.register_pytree_node_class
class MeshTiles:
    """Tile-binned separable stencil.

    ``smat`` holds the per-slot axis matrices side by side on the lane axis:
    ``[ntiles, cap, k*W]`` with blocks (Sx, Sy, Sz[, dSx, dSy, dSz]).
    ``aid`` is the slot -> atom map ([ntiles*cap], empty slots -> n): the
    gather-form dual of ``flat_slot`` (atom -> slot), used to build slot
    arrays as row gathers instead of random-destination scatters.
    """

    _fields = ("smat", "flat_slot", "aid", "counts_max", "inv")

    def __init__(self, smat, flat_slot, aid, counts_max, inv, mesh_dims,
                 tile, cap, order, has_grad):
        self.smat = smat
        self.flat_slot = flat_slot
        self.aid = aid
        self.counts_max = counts_max
        self.inv = inv
        self.mesh_dims = tuple(int(d) for d in mesh_dims)
        self.tile = int(tile)
        self.cap = int(cap)
        self.order = int(order)
        self.has_grad = bool(has_grad)

    @property
    def w_win(self):
        return self.tile + _HALO_LEFT + _HALO_RIGHT

    def axis_mat(self, idx: int):
        w = self.w_win
        return self.smat[..., idx * w:(idx + 1) * w]

    def tree_flatten(self):
        return (
            tuple(getattr(self, f) for f in self._fields),
            (self.mesh_dims, self.tile, self.cap, self.order, self.has_grad),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        mesh_dims, tile, cap, order, has_grad = aux
        return cls(*children, mesh_dims=mesh_dims, tile=tile, cap=cap,
                   order=order, has_grad=has_grad)


def _stencil_rows(positions, inv, mesh_dims, order: int, tile: int,
                  need_grad: bool):
    """Per-atom packed axis-matrix rows + linear tile ids (shared by
    :func:`build_mesh_tiles` and :func:`refresh_mesh_tiles`)."""
    dtype = positions.dtype
    n = positions.shape[0]
    nx, ny, nz = (int(d) for d in mesh_dims)
    w_win = tile + _HALO_LEFT + _HALO_RIGHT
    dims_f = jnp.asarray([nx, ny, nz], dtype)

    frac = apply_mat3(positions, inv)
    mc = frac * dims_f
    mc = mc - jnp.floor(mc / dims_f) * dims_f  # wrap into [0, dims)
    mc = jnp.where(mc >= dims_f, 0.0, mc)      # float-rounding seam guard
    base_f = jnp.floor(mc)
    theta = mc - base_f
    base = base_f.astype(INDEX_DTYPE)

    i = jnp.arange(order, dtype=INDEX_DTYPE)
    offset_start = jnp.floor(theta - (order - 2) * 0.5).astype(INDEX_DTYPE)
    u = order * 0.5 + theta[..., None] - (i[None, None, :] + offset_start[..., None]).astype(dtype)
    w = bspline_weight(u, order)                              # [N, 3, order]

    tile_idx = base // tile                                    # [N, 3]
    # window-local index of stencil point 0 (window origin tile*T - 1)
    local0 = base + offset_start - (tile_idx * tile - _HALO_LEFT)  # [N, 3]

    ntx, nty, ntz = nx // tile, ny // tile, nz // tile
    lin = (tile_idx[:, 0] * nty + tile_idx[:, 1]) * ntz + tile_idx[:, 2]

    # one-hot local axis matrices packed to [N, k*W]: per axis, the
    # (weights x window-start) outer product is built with constant
    # one-hot expanders (rule 6) and routed to its banded columns by one
    # constant [A*S, kw] matmul — 3 x ~6 output-sized passes instead of
    # the 24-iteration compare-select loop (~96 passes).  HIGHEST keeps
    # the 0/1 selections exact in f32.
    k_blocks = 6 if need_grad else 3
    kw = k_blocks * w_win
    n_start = w_win - order + 1          # window-local stencil starts
    n_vals = 2 * order if need_grad else order
    if need_grad:
        dw = bspline_derivative(u, order) * dims_f[None, :, None]

    r_vals = np.zeros((n_vals, n_vals * n_start), np.float32)
    r_start = np.zeros((n_start, n_vals * n_start), np.float32)
    route = np.zeros((3, n_vals * n_start, kw), np.float32)
    for a in range(n_vals):
        for s in range(n_start):
            r_vals[a, a * n_start + s] = 1.0
            r_start[s, a * n_start + s] = 1.0
    for d in range(3):
        for ii in range(order):
            for s in range(n_start):
                route[d, ii * n_start + s, d * w_win + s + ii] = 1.0
                if need_grad:
                    route[d, (order + ii) * n_start + s,
                          (3 + d) * w_win + s + ii] = 1.0
    r_vals_c = jnp.asarray(r_vals, dtype)
    r_start_c = jnp.asarray(r_start, dtype)
    hi = jax.lax.Precision.HIGHEST
    siota = jax.lax.broadcasted_iota(INDEX_DTYPE, (1, n_start), 1)
    rows = jnp.zeros((n, kw), dtype)
    for d in range(3):
        vals = (jnp.concatenate([w[:, d, :], dw[:, d, :]], axis=-1)
                if need_grad else w[:, d, :])            # [N, n_vals]
        oh_s = (siota == local0[:, d, None]).astype(dtype)   # [N, n_start]
        outer = (jnp.matmul(vals, r_vals_c, precision=hi)
                 * jnp.matmul(oh_s, r_start_c, precision=hi))
        rows = rows + jnp.matmul(outer, jnp.asarray(route[d], dtype),
                                 precision=hi)
    return rows, lin


def _use_slot_gather(n: int, ntiles: int, cap: int) -> bool:
    """Static heuristic: build MESH-TILE slot arrays by gather or scatter.

    Round-4 finding (the round-3 6% headline regression, VERDICT weak
    #3): the gather form — proven for the *atom grid's* property planes
    (grid.use_slot_gather, 524k: 3.7 vs 20.9 ms) — LOSES for the spline
    mesh tiles at every measured config: 64x2000 batched PME 2x slower
    (pme_batch_engine_probe) and the 110k/128^3 headline PME E+F 11.9 ms
    gather vs 10.0 scatter (benchmarks/r4_slotgather_probe.py).  The
    tile build's row scatter lands mostly-coalesced (atoms are mesh-
    sorted), unlike the grid build's.  Scatter everywhere until a config
    is measured where gather wins.

    ``NVALCHEMIOPS_SLOT_GATHER=0|1`` (trace-time, probe-only) forces the
    answer, as in ``grid.use_slot_gather``.
    """
    env = os.environ.get("NVALCHEMIOPS_SLOT_GATHER")
    if env in ("0", "1"):
        return env == "1"
    return False


def _slot_maps(lin, ntiles: int, cap: int):
    """Both directions of the slot assignment from one bucket sort.

    Returns ``(flat_slot [N], aid [ntiles*cap], counts_max)``:
    atom -> slot (overflow -> trash ``ntiles*cap``) and slot -> atom
    (empty -> ``n``).  The aid direction turns every slot-array build
    into a row gather (same economics as grid.py's gather-form build:
    random-destination row scatters measured 5-6x slower on chip,
    benchmarks/scatter_strategy_probe.py / prop_plane_probe.py).
    """
    n = lin.shape[0]
    iota = jnp.arange(n, dtype=INDEX_DTYPE)
    sorted_lin, order = jax.lax.sort(
        (lin.astype(INDEX_DTYPE), iota), num_keys=1, is_stable=True)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_lin[1:] != sorted_lin[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, iota, 0))
    rank_sorted = iota - run_start
    counts_max = jnp.max(rank_sorted, initial=-1) + 1
    flat_slot = jnp.zeros((n,), INDEX_DTYPE).at[order].set(
        jnp.where(rank_sorted >= cap, ntiles * cap,
                  sorted_lin * cap + rank_sorted))
    # histogram + exclusive cumsum, not searchsorted (19.4 vs 3.4 ms for
    # 149k buckets at 512k atoms on chip — benchmarks/build45_stage_probe)
    counts = jnp.zeros((ntiles,), INDEX_DTYPE).at[lin.astype(INDEX_DTYPE)
                                                  ].add(1)
    starts = jnp.cumsum(counts) - counts
    src = starts[:, None] + jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
    src = jnp.where(src < (starts + counts)[:, None], src, n)
    order_padded = jnp.concatenate([order, jnp.asarray([n], INDEX_DTYPE)])
    aid = order_padded[src.reshape(-1)]
    return flat_slot, aid, counts_max


def build_mesh_tiles(positions, cell, mesh_dims, order: int, cap: int,
                     tile: int = 8, need_grad: bool = True) -> MeshTiles:
    """Bin atoms by stencil-base mesh tile and build local axis matrices.

    ``cap`` must come from :func:`mesh_tile_capacity` (static under jit);
    ``counts_max`` reports the observed maximum for overflow checks.
    """
    dtype = positions.dtype
    nx, ny, nz = (int(d) for d in mesh_dims)
    inv = jnp.linalg.inv(jnp.asarray(cell, dtype=dtype).reshape(3, 3))
    rows, lin = _stencil_rows(positions, inv, mesh_dims, order, tile,
                              need_grad)
    ntiles = (nx // tile) * (ny // tile) * (nz // tile)
    flat_slot, aid, counts_max = _slot_maps(lin, ntiles, cap)

    if _use_slot_gather(rows.shape[0], ntiles, cap):
        rows_padded = jnp.concatenate(
            [rows, jnp.zeros((1, rows.shape[1]), dtype)], axis=0)
        smat = rows_padded[aid].reshape(ntiles, cap, rows.shape[1])
    else:
        buf = jnp.zeros((ntiles * cap + 1, rows.shape[1]), dtype)
        smat = buf.at[flat_slot].set(rows)[:-1].reshape(
            ntiles, cap, rows.shape[1])

    return MeshTiles(smat, flat_slot, aid, counts_max, inv, (nx, ny, nz),
                     tile, cap, order, need_grad)


def mesh_tiles_need_rebuild(tiles: MeshTiles, positions, cell=None):
    """True (device scalar) when any atom left its stencil-base mesh tile.

    The MD-loop analogue of the neighbor-list skin check
    (neighborlist/rebuild_detection.py): while every atom stays in the
    tile recorded in ``tiles.flat_slot``, :func:`refresh_mesh_tiles`
    may skip the bucket sort.  Atoms that overflowed the capacity at
    build time always force a rebuild.  ``cell=None`` reuses the cached
    ``tiles.inv`` (fixed-cell MD).
    """
    nx, ny, nz = tiles.mesh_dims
    tile, cap = tiles.tile, tiles.cap
    dtype = positions.dtype
    inv = (tiles.inv if cell is None
           else jnp.linalg.inv(jnp.asarray(cell, dtype).reshape(3, 3)))
    dims_f = jnp.asarray([nx, ny, nz], dtype)
    mc = apply_mat3(positions, inv) * dims_f
    mc = mc - jnp.floor(mc / dims_f) * dims_f
    mc = jnp.where(mc >= dims_f, 0.0, mc)
    t = jnp.floor(mc).astype(INDEX_DTYPE) // tile
    nty, ntz = ny // tile, nz // tile
    lin = (t[:, 0] * nty + t[:, 1]) * ntz + t[:, 2]
    ntiles = (nx // tile) * nty * ntz
    overflowed = tiles.flat_slot >= ntiles * cap
    cached_lin = tiles.flat_slot // cap
    return jnp.any(overflowed | (lin != cached_lin))


def refresh_mesh_tiles(tiles: MeshTiles, positions, cell=None) -> MeshTiles:
    """Recompute the axis matrices for new positions, reusing the cached
    tile assignment — skips the bucket sort AND the slot-map build (the
    cached ``aid`` turns the refresh into stencil rows + one row gather).

    Valid only while :func:`mesh_tiles_need_rebuild` is False: atoms must
    still be in their recorded tiles (B-spline weights change continuously
    with position; the *binning* is what this reuses).  ``cell=None``
    reuses the cached ``tiles.inv``.
    """
    dtype = positions.dtype
    nx, ny, nz = tiles.mesh_dims
    tile, cap = tiles.tile, tiles.cap
    inv = (tiles.inv if cell is None
           else jnp.linalg.inv(jnp.asarray(cell, dtype).reshape(3, 3)))
    rows, _ = _stencil_rows(positions, inv, tiles.mesh_dims, tiles.order,
                            tile, tiles.has_grad)
    ntiles = (nx // tile) * (ny // tile) * (nz // tile)
    if _use_slot_gather(rows.shape[0], ntiles, cap):
        rows_padded = jnp.concatenate(
            [rows, jnp.zeros((1, rows.shape[1]), dtype)], axis=0)
        smat = rows_padded[tiles.aid].reshape(ntiles, cap, rows.shape[1])
    else:
        buf = jnp.zeros((ntiles * cap + 1, rows.shape[1]), dtype)
        smat = buf.at[tiles.flat_slot].set(rows)[:-1].reshape(
            ntiles, cap, rows.shape[1])
    return MeshTiles(smat, tiles.flat_slot, tiles.aid, tiles.counts_max,
                     inv, tiles.mesh_dims, tile, cap, tiles.order,
                     tiles.has_grad)


def _fold_axis(arr, nt_axis: int, n: int, tile: int):
    """Fold overlapping (tile, window) pairs along one axis.

    ``arr``: [..., nt, W, ...trailing] with the tile axis at ``nt_axis`` and
    its window axis immediately after.  Windows start at ``t*tile - 1`` with
    width W <= 2*tile, so even/odd tiles write disjoint stride-2*tile blocks.
    Returns the folded, periodically wrapped axis of length ``n``.
    """
    arr = jnp.moveaxis(jnp.moveaxis(arr, nt_axis, 0), nt_axis + 1, 1)
    nt, w_win = arr.shape[0], arr.shape[1]
    rest = arr.shape[2:]
    nt_even = nt + (nt % 2)
    if nt_even != nt:
        arr = jnp.pad(arr, ((0, 1), (0, 0)) + ((0, 0),) * len(rest))
    # ext covers global indices [-1, ...]: parity blocks span
    # [tile*a - 1, tile*a - 1 + (nt_even/2)*2*tile)
    ext_len = n + (nt_even - nt) * tile + tile + _HALO_RIGHT + _HALO_LEFT
    ext = jnp.zeros((ext_len,) + rest, arr.dtype)
    for a in (0, 1):
        sub = arr[a::2]                                    # [nt_even/2, W, ...]
        sub = jnp.pad(sub, ((0, 0), (0, 2 * tile - w_win)) + ((0, 0),) * len(rest))
        span = sub.shape[0] * 2 * tile
        ext = ext.at[tile * a: tile * a + span].add(sub.reshape((span,) + rest))
    # ext index e holds global g = e - 1; wrap halo back onto [0, n)
    core = ext[_HALO_LEFT:_HALO_LEFT + n]
    right = ext[_HALO_LEFT + n:]
    while right.shape[0] > 0:  # halo can exceed n when nt is tiny
        t = min(right.shape[0], n)
        core = core.at[:t].add(right[:t])
        right = right[t:]
    core = core.at[n - _HALO_LEFT:].add(ext[:_HALO_LEFT])
    return jnp.moveaxis(core, 0, nt_axis)


def _expand_onehots(w_win: int, dtype):
    """Constant one-hots R_y[y, (y',x')] and R_x[x, (y',x')] for (x) products."""
    m = w_win * w_win
    ry = np.zeros((w_win, m), np.float32)
    rx = np.zeros((w_win, m), np.float32)
    for yy in range(w_win):
        for xx in range(w_win):
            ry[yy, yy * w_win + xx] = 1.0
            rx[xx, yy * w_win + xx] = 1.0
    return jnp.asarray(ry, dtype), jnp.asarray(rx, dtype)


def _axis_expanded(tiles: MeshTiles, idx: int, onehot):
    """One axis matrix expanded onto the (y', x') product lanes."""
    return jnp.matmul(tiles.axis_mat(idx), onehot,
                      precision=jax.lax.Precision.HIGHEST)


def _tyx(tiles: MeshTiles, iy: int, ix: int):
    """(S_y (x) S_x) flat [ntiles, cap, W*W] without thin intermediates."""
    ry, rx = _expand_onehots(tiles.w_win, tiles.smat.dtype)
    return _axis_expanded(tiles, iy, ry) * _axis_expanded(tiles, ix, rx)


def windowed_spread(tiles: MeshTiles, values, engine: str = "xla"):
    """mesh[x,y,z] = sum_n values[n] S_x S_y S_z via per-tile contraction.

    ``engine="pallas"`` runs the per-tile contraction in a fused Mosaic
    kernel (pallas/windowed_gather.py:pallas_spread_windows): the
    [ntiles, cap, W*W] tensor-product intermediate (~113 MB at 128^3/110k)
    never reaches HBM.
    """
    nx, ny, nz = tiles.mesh_dims
    tile, cap, w_win = tiles.tile, tiles.cap, tiles.w_win
    ntx, nty, ntz = nx // tile, ny // tile, nz // tile
    ntiles = ntx * nty * ntz

    if _use_slot_gather(values.shape[0], ntiles, cap):
        values_padded = jnp.concatenate(
            [values, jnp.zeros((1,), values.dtype)])
        q_t = values_padded[tiles.aid].reshape(ntiles, cap)
    else:
        qbuf = jnp.zeros((ntiles * cap + 1,), values.dtype)
        q_t = qbuf.at[tiles.flat_slot].set(values)[:-1].reshape(ntiles, cap)

    if engine == "pallas":
        from nvalchemiops_tpu.pallas.windowed_gather import (
            pallas_spread_windows,
        )

        windows = pallas_spread_windows(tiles, q_t)
    else:
        qsz = q_t[..., None] * tiles.axis_mat(2)
        tyx = _tyx(tiles, 1, 0)
        # full f32: a bf16-pass contraction of the spline weights costs
        # ~4e-3 relative mesh error (measured 3e-3 end-to-end PME energy
        # error).  HIGHEST: measured only 0.6 ms over HIGH at 128^3/110k
        # for 10x tighter end accuracy (PME E 4e-6 vs 2e-5 relative)
        windows = jnp.einsum("tcz,tcm->tzm", qsz, tyx,
                             precision=jax.lax.Precision.HIGHEST)

    # fold chain ordered z -> y -> x; every relayout keeps fat trailing dims
    a = windows.reshape(ntx, nty, ntz, w_win, w_win * w_win)
    a = _fold_axis(a, 2, nz, tile)                       # [tx, ty, nz, W*W]
    a = jnp.swapaxes(a, 2, 3)                            # [tx, ty, W*W, nz]
    a = a.reshape(ntx, nty, w_win, w_win, nz)            # [tx, ty, wy, wx, nz]
    a = _fold_axis(a, 1, ny, tile)                       # [tx, ny, wx, nz]
    a = jnp.swapaxes(a, 1, 2)                            # [tx, wx, ny, nz]
    return _fold_axis(a, 0, nx, tile)                    # [nx, ny, nz]


def _extract_windows(mesh, tile: int):
    """Overlapping per-tile windows [ntiles, W, W*W] via whole-slab takes."""
    nx, ny, nz = mesh.shape
    w_win = tile + _HALO_LEFT + _HALO_RIGHT
    ntx, nty, ntz = nx // tile, ny // tile, nz // tile

    def win_idx(nt, n):
        idx = (np.arange(nt)[:, None] * tile - _HALO_LEFT
               + np.arange(w_win)[None, :]) % n
        return jnp.asarray(idx.reshape(-1), INDEX_DTYPE)

    a = jnp.take(mesh, win_idx(ntx, nx), axis=0)         # [(tx,wx), ny, nz]
    a = a.reshape(ntx, w_win, ny, nz)
    a = jnp.swapaxes(a, 1, 2)                            # [tx, ny, wx, nz]
    a = jnp.take(a, win_idx(nty, ny), axis=1)            # [tx, (ty,wy), wx, nz]
    a = a.reshape(ntx, nty, w_win, w_win, nz)            # [tx, ty, wy, wx, nz]
    a = a.reshape(ntx, nty, w_win * w_win, nz)
    a = jnp.swapaxes(a, 2, 3)                            # [tx, ty, nz, W*W]
    a = jnp.take(a, win_idx(ntz, nz), axis=2)            # [tx, ty, (tz,wz), W*W]
    return a.reshape(ntx * nty * ntz, w_win, w_win * w_win)


def windowed_gather(tiles: MeshTiles, mesh, with_gradient: bool = False,
                    order: str | None = None):
    """Per-atom interpolation (and optional fractional-axis gradients).

    Returns ``values [N]`` or ``(values, grad_frac [N, 3])`` where the
    gradient components are d/d(fractional coord) scaled by mesh dims (like
    spline._stencil's ``dw``); rotate with ``tiles.inv`` for Cartesian.

    ``order`` picks the contraction order (design-guide rule 15):

    - ``"m"`` (default) contracts the fat W*W axis first (``Q[t,c,z]``);
      the thin [t, cap, W] outputs are the only thin arrays.  Measured
      faster for BOTH paths at 128^3/110k: E-gather 3.60 vs 4.88 ms,
      E+F gather 10.18 vs 10.91 ms incl binning
      (benchmarks/gather_order_probe.py) — design-guide rule 15.
    - ``"z"`` contracts z first (``A[t,c,m]``, fat) and shares A across
      values/gx/gy (and Ad for gz); fewer matmuls but every elementwise
      reduce then runs on 10x more lanes — measured slower.
    """
    win = _extract_windows(mesh, tiles.tile)             # [t, W, W*W]
    if order is None:
        order = "m"

    def per_atom(plane):
        return plane.reshape(-1)[jnp.minimum(tiles.flat_slot, plane.size - 1)]

    def per_atom4(planes):
        # ONE random per-atom gather for all outputs: each 110k-element
        # flat gather costs ~1 ms at 1e8 elem/s (rule 7); gathering [S, 4]
        # rows costs the same as [S] scalars.
        stacked = jnp.stack(planes, axis=-1).reshape(-1, len(planes))
        rows = stacked[jnp.minimum(tiles.flat_slot, stacked.shape[0] - 1)]
        return rows[:, 0], rows[:, 1:]

    hi = jax.lax.Precision.HIGHEST
    if order == "m":
        def q_of(tyx_variant):
            return jnp.einsum("tcm,tzm->tcz", tyx_variant, win, precision=hi)

        if not with_gradient:
            return per_atom(
                jnp.sum(tiles.axis_mat(2) * q_of(_tyx(tiles, 1, 0)), axis=-1))
        # share the one-hot axis expansions across the three (y, x)
        # tensor-product variants: 4 expansion matmuls instead of 6
        ry, rx = _expand_onehots(tiles.w_win, tiles.smat.dtype)
        ys = _axis_expanded(tiles, 1, ry)
        xs = _axis_expanded(tiles, 0, rx)
        q = q_of(ys * xs)
        values, grad = per_atom4([
            jnp.sum(tiles.axis_mat(2) * q, axis=-1),
            jnp.sum(tiles.axis_mat(2)
                    * q_of(ys * _axis_expanded(tiles, 3, rx)), axis=-1),
            jnp.sum(tiles.axis_mat(2)
                    * q_of(_axis_expanded(tiles, 4, ry) * xs), axis=-1),
            jnp.sum(tiles.axis_mat(5) * q, axis=-1),
        ])
        return values, grad

    A = jnp.einsum("tcz,tzm->tcm", tiles.axis_mat(2), win, precision=hi)
    tyx = _tyx(tiles, 1, 0)
    if not with_gradient:
        return per_atom(jnp.sum(tyx * A, axis=-1))

    Ad = jnp.einsum("tcz,tzm->tcm", tiles.axis_mat(5), win, precision=hi)
    values, grad = per_atom4([
        jnp.sum(tyx * A, axis=-1),
        jnp.sum(_tyx(tiles, 1, 3) * A, axis=-1),
        jnp.sum(_tyx(tiles, 4, 0) * A, axis=-1),
        jnp.sum(tyx * Ad, axis=-1),
    ])
    return values, grad
