# SPDX-License-Identifier: Apache-2.0
"""Pre-windowed per-cell Pallas pair sweep: minimal-slot lane-aligned blocks.

Third-generation pair-sweep harness, driven by the block-sweep cost model
fit on chip (``benchmarks/mosaic_floor_probe.py``:
``t_pass ~ n_blocks * 200 ns + slots * 0.75 ps/op``).  The super-chunk
engine (block_sweep.py) merges G x-cells per block, so every row pays the
whole merged window W = (G + 2Rx) * cap — a (G + 2Rx)/G ~ 1.8x slot slack
at G = 4 / Rx = 1.  Shrinking G to 1 removes the slack but pays the fixed
block cost 16x more often on a misaligned 3*cap-lane window.

This harness removes both costs: candidate planes are PRE-WINDOWED in XLA
(for each own x-cell g, the (2Rx+1)-cell window [g, g+2Rx] of the extended
plane is packed into a lane-aligned ``lane_w``-lane slice, lane padding
parked far away / zeroed), so the kernel runs ONE block per (z, y) row
with a static per-cell loop over x — every pair block is an exact
[cap, lane_w] tile, every slice 128-aligned, and the half-space (dz, dy)
offsets arrive as extra input windows of the same shape (no grid
dimension, no revisiting).  Measured on chip at 109,744 atoms
(16^3 cells, cap 40, lane_w 128): trivial pair body 0.46 ms/pass and the
D3 CN pass 1.56 ms vs 2.81 ms for the G-merged block engine and ~7 ms for
the XLA row sweep (benchmarks/window_sweep_probe.py).

Layout contract (mirrors block_sweep where possible):

- own per-atom data arrives as column planes ``[cz, cy, cx*cap, F]``;
- candidate scalar data arrives as pre-windowed row planes
  ``[ez, ey, 1, cx*lane_w]`` built by :func:`window_rows`;
- candidate MXU features arrive as pre-windowed TRANSPOSED column planes
  ``[ez, ey, F, cx*lane_w]`` built by :func:`window_colsT` (the body sees
  [F, lane_w] slices: ``lf [M, F] @ slice`` is a direct matmul);
- j-side accumulators come back per offset as windowed planes the caller
  folds with :func:`fold_window_j` (+ ``grid.fold_halo``).

Reference counterpart: the per-thread cell sweeps of
``nvalchemiops/neighborlist/cell_list.py:372-556`` and the D3 pair kernels
(``nvalchemiops/interactions/dispersion/dftd3.py:752-1258``) — re-blocked
into lane-aligned windows for the TPU VPU/MXU instead of per-thread scalar
loops.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvalchemiops_tpu.types import INDEX_DTYPE

__all__ = [
    "window_sweep",
    "window_rows",
    "window_colsT",
    "window_lane_width",
    "window_x_block",
    "fold_window_j",
    "WINDOW_PARK",
]

# Largest per-block row width (lanes) the Mosaic compile is proven to
# handle: cx*lane_w = 16*128 = 2048 at the 110k-atom composite geometry;
# the unblocked compile fails at cx=26 (lwin=3328).  Rows wider than this
# are split into x-blocks of at most this many lanes (window_x_block).
_MAX_BLOCK_LANES = 2048

# Lane-pad park displacement for position windows.  Must be far enough
# that any (real atom, pad lane) distance fails every cutoff test, but
# distinct from the grid's empty-slot park band (grid.DISPLACE = 3e7 +
# slot * 1e5) so pad lanes are also out of range of parked slots.
WINDOW_PARK = 1.0e7


def _halfspace_zy(rz, ry):
    return [
        (dz, dy)
        for dz in range(-rz, rz + 1)
        for dy in range(-ry, ry + 1)
        if dz > 0 or (dz == 0 and dy > 0)
    ]


def window_lane_width(cap: int, rx: int) -> int:
    """Lane width of one x-window: (2*rx+1)*cap rounded up to 128."""
    return -(-((2 * rx + 1) * cap) // 128) * 128


def window_x_block(cx: int, lane_w: int) -> int:
    """Largest divisor ``bx`` of ``cx`` with ``bx*lane_w`` in the proven
    Mosaic block-width regime (<= 2048 lanes); 1 if none fits."""
    best = 1
    for bx in range(1, cx + 1):
        if cx % bx == 0 and bx * lane_w <= _MAX_BLOCK_LANES:
            best = bx
    return best


def window_rows(ext_plane, rx: int, cap: int, lane_w: int, park=0.0):
    """Pre-window a scalar plane: [ez, ey, ex, cap] -> [ez, ey, 1, cx*lane_w].

    Window g (own x-cell g) packs the ext x-cells [g, g+2*rx] into lanes
    [g*lane_w, g*lane_w + (2*rx+1)*cap); lane padding is ``park`` (use
    :data:`WINDOW_PARK` for the x-position plane so the distance test
    alone excludes pad lanes from every pair body).
    """
    ez, ey, ex, _cap = ext_plane.shape
    cx = ex - 2 * rx
    nw = 2 * rx + 1
    w = jnp.concatenate(
        [ext_plane[:, :, c:c + cx] for c in range(nw)], axis=-1
    )  # [ez, ey, cx, nw*cap]
    pad = lane_w - nw * cap
    if pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad)),
                    constant_values=park)
    return w.reshape(ez, ey, 1, cx * lane_w)


def window_colsT(ext_plane5, rx: int, cap: int, lane_w: int):
    """Pre-window a feature plane, transposed for direct MXU use.

    ``ext_plane5`` [ez, ey, ex, cap, F] -> [ez, ey, F, cx*lane_w] with the
    same lane layout as :func:`window_rows` (pad lanes zero, so padded
    features contribute nothing to any contraction).
    """
    ez, ey, ex, _cap, f = ext_plane5.shape
    cx = ex - 2 * rx
    nw = 2 * rx + 1
    w = jnp.concatenate(
        [ext_plane5[:, :, c:c + cx] for c in range(nw)], axis=3
    )  # [ez, ey, cx, nw*cap, F]
    pad = lane_w - nw * cap
    if pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    return jnp.transpose(w, (0, 1, 4, 2, 3)).reshape(ez, ey, f, cx * lane_w)


def fold_window_j(dims, radius, cap: int, lane_w: int, j_win):
    """Fold a windowed j accumulator back onto the extended plane.

    ``j_win`` [cz, cy, n_off, 1, cx*lane_w] (one windowed row per
    half-space offset, offset order ``[(0,0)] + _halfspace_zy``) ->
    extended accumulator [ez, ey, ex, cap] (caller applies
    ``grid.fold_halo``).
    """
    cz, cy, cx = dims
    rz, ry, rx = radius
    nw = 2 * rx + 1
    ez, ey, ex = cz + 2 * rz, cy + 2 * ry, cx + 2 * rx
    offs = [(0, 0)] + _halfspace_zy(rz, ry)
    jw = j_win[:, :, :, 0, :].reshape(cz, cy, len(offs), cx, lane_w)
    jw = jw[..., :nw * cap].reshape(cz, cy, len(offs), cx, nw, cap)
    acc = jnp.zeros((ez, ey, ex, cap), j_win.dtype)
    for oi, (dz, dy) in enumerate(offs):
        for c in range(nw):
            acc = acc.at[rz + dz:rz + dz + cz,
                         ry + dy:ry + dy + cy,
                         c:c + cx].add(jw[:, :, oi, :, c])
    return acc


def window_sweep(
    dims,
    radius,
    cap: int,
    own_cols: dict,
    cand_wrows: dict,
    cand_wcolsT: dict,
    body,
    num_own_out: int,
    num_j_out: int,
    lane_w: int | None = None,
    dtype=jnp.float32,
    interpret: bool = False,
    x_block: int | None = None,
):
    """Run ``body`` over all symmetric pre-windowed per-cell pair blocks.

    Parameters
    ----------
    own_cols : dict name -> [cz, cy, cx*cap, F] column planes (pack
        scalars with ``block_sweep.pack_columns``).
    cand_wrows : dict name -> [ez, ey, 1, cx*lane_w] pre-windowed scalar
        planes (:func:`window_rows`).
    cand_wcolsT : dict name -> [ez, ey, F, cx*lane_w] pre-windowed
        transposed feature planes (:func:`window_colsT`).
    body(own, cand_row, cand_colT, home) -> (own_blocks, j_blocks):
        per own x-cell, ``own[k]`` = [cap, F] slices; ``cand_row[k]`` =
        [n_off, 1, lane_w] (offset 0 = the home (0, 0) offset);
        ``cand_colT[k]`` = list of n_off [F, lane_w] slices; ``home`` =
        the [cap, lane_w] pair-once mask the body must apply to offset 0
        of every validity test.  Blocks returned are [n_off, cap, lane_w];
        a ``j_blocks`` entry may be ``("neg", blk)`` (negated after the
        row reduce, as in block_sweep).

    Returns ``(own_accs, ext_accs)``: tuples of [cz, cy, cx, cap] interior
    planes and [ez, ey, ex, cap] extended j accumulators (fold with
    ``grid.fold_halo``).

    ``x_block`` splits each (z, y) row into ``cx/x_block`` grid steps of
    ``x_block`` own cells (must divide ``cx``); default picks the largest
    divisor whose block stays in the proven <=2048-lane Mosaic regime, so
    wide rows (e.g. cx=26 at 524k atoms) compile instead of failing.
    """
    cz, cy, cx = dims
    rz, ry, rx = radius
    if lane_w is None:
        lane_w = window_lane_width(cap, rx)
    if lane_w % 128:
        raise ValueError(f"lane_w={lane_w} must be a multiple of 128")
    if (2 * rx + 1) * cap > lane_w:
        raise ValueError(
            f"window (2*{rx}+1)*{cap} exceeds lane_w={lane_w}")
    if x_block is None:
        # trace-time knob (reference precedent: ALCH_EWALD_BATCH_BLOCK_SIZE,
        # ewald.py:182): forces the x-blocked grid at geometries where the
        # single-block path would be chosen — used by chip_smoke.py to gate
        # the nxb>1 Mosaic lowering on every round.  CAVEAT: read at TRACE
        # time, so it is ignored for (shape, arg) combinations already in
        # the process's jit cache and applies to every window_sweep call
        # while set; prefer passing ``x_block=`` explicitly outside smoke
        # probes.
        env = os.environ.get("NVALCHEMIOPS_WINDOW_X_BLOCK")
        if env:
            try:
                x_block = int(env)
            except ValueError as exc:
                raise ValueError(
                    "NVALCHEMIOPS_WINDOW_X_BLOCK must be an integer "
                    f"dividing the grid x extent, got {env!r}") from exc
        else:
            x_block = window_x_block(cx, lane_w)
    bx = x_block
    if cx % bx:
        raise ValueError(f"x_block={bx} must divide cx={cx}")
    if bx * lane_w > _MAX_BLOCK_LANES:
        # window_x_block returns 1 when lane_w alone exceeds the proven
        # block width (e.g. very large caps): the Mosaic compile may fail
        # with an opaque error — surface the actual geometry first.
        import warnings

        warnings.warn(
            f"window_sweep block width {bx}*{lane_w}={bx * lane_w} lanes "
            f"exceeds the proven Mosaic regime ({_MAX_BLOCK_LANES}); the "
            "kernel may fail to compile — consider a smaller cap or the "
            "xla engine",
            stacklevel=2,
        )
    nxb = cx // bx
    lrow = cx * cap
    lwin = cx * lane_w
    lbrow = bx * cap
    lbwin = bx * lane_w

    offs = [(0, 0)] + _halfspace_zy(rz, ry)
    n_off = len(offs)
    dz_arr = jnp.asarray([o[0] + rz for o in offs], INDEX_DTYPE)
    dy_arr = jnp.asarray([o[1] + ry for o in offs], INDEX_DTYPE)

    own_names = sorted(own_cols)
    wrow_names = sorted(cand_wrows)
    wcolt_names = sorted(cand_wcolsT)

    def kernel(dzr, dyr, *refs):
        it = iter(refs)
        own_refs = {k: next(it) for k in own_names}
        wrow_refs = {k: [next(it) for _ in range(n_off)] for k in wrow_names}
        wcolt_refs = {k: [next(it) for _ in range(n_off)]
                      for k in wcolt_names}
        own_out = [next(it) for _ in range(num_own_out)]
        j_out = [next(it) for _ in range(num_j_out)]
        scratch = [next(it) for _ in range(num_own_out)]

        for a in scratch:
            a[:] = jnp.zeros((lbrow, 8), dtype)
        for r in j_out:
            r[0, 0] = jnp.zeros((n_off, 1, lbwin), dtype)

        # pair-once mask for the home offset, from iotas (Mosaic-friendly):
        # within the window, cells left of center are excluded (covered by
        # their own home windows), the center cell keeps the upper
        # triangle, right cells and pad lanes are kept (pad lanes park out
        # via distance / zero features).
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap, lane_w), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (cap, lane_w), 0)
        home = (lane >= (rx + 1) * cap) | (
            (lane >= rx * cap) & (lane - rx * cap > row))

        # Sub-window split: the lane_w=256 whole-window lowering produced
        # wrong j-side forces on chip (rel rms 3e-2, round 3,
        # benchmarks/window_lane256_probe.py) while interpret agreed, so
        # windows wider than one 128-lane register are processed as
        # independent 128-lane sub-slices — every body tensor and every
        # j-out update stays in the proven [cap, 128] Mosaic regime.  The
        # body is lane-elementwise (MXU contractions run over the feature
        # axis, never lanes), so the split is mechanical.
        n_sub = lane_w // 128
        for g in range(bx):
            own = {k: r[0, 0, g * cap:(g + 1) * cap, :]
                   for k, r in own_refs.items()}
            for s in range(n_sub):
                lo = g * lane_w + s * 128
                sl = slice(lo, lo + 128)
                crow = {
                    k: jnp.stack(
                        [rs[o][0, 0, 0:1, sl] for o in range(n_off)],
                        axis=0)
                    for k, rs in wrow_refs.items()
                }
                ccolt = {k: [rs[o][0, 0, :, sl] for o in range(n_off)]
                         for k, rs in wcolt_refs.items()}
                own_blocks, j_blocks = body(
                    own, crow, ccolt, home[:, s * 128:(s + 1) * 128])
                for a, blk in zip(scratch, own_blocks):
                    a[g * cap:(g + 1) * cap, 0:1] += jnp.sum(
                        blk, axis=(0, 2))[:, None]
                for r, blk in zip(j_out, j_blocks):
                    if isinstance(blk, tuple) and blk[0] == "neg":
                        r[0, 0, :, 0:1, sl] += -jnp.sum(
                            blk[1], axis=1, keepdims=True)
                    else:
                        r[0, 0, :, 0:1, sl] += jnp.sum(blk, axis=1,
                                                       keepdims=True)

        i8 = jnp.eye(8, dtype=dtype)
        for r, a in zip(own_out, scratch):
            transposed = jax.lax.dot_general(
                i8, a[:], (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=dtype,
            )
            if nxb == 1:
                r[0, 0] = transposed
            else:
                r[0, 0, 0] = transposed

    # Index maps: the proven single-block path keeps the 2-D (z, y) grid
    # exactly as measured at 110k; wide rows (nxb > 1) add a third,
    # parallel x-block grid dimension (block index xb selects the
    # [xb*bx .. (xb+1)*bx) own cells and their windows).
    if nxb == 1:
        grid_dims = (cz, cy)

        def _own_map():
            return lambda z, y, dzr, dyr: (z, y, 0, 0)

        def _win_map(o):
            return partial(lambda z, y, dzr, dyr, o=0: (
                z + dzr[o], y + dyr[o], 0, 0), o=o)

        _own_out_map = lambda z, y, dzr, dyr: (z, y, 0, 0)  # noqa: E731
        _j_out_map = lambda z, y, dzr, dyr: (z, y, 0, 0, 0)  # noqa: E731
    else:
        grid_dims = (cz, cy, nxb)

        def _own_map():
            return lambda z, y, xb, dzr, dyr: (z, y, xb, 0)

        def _win_map(o):
            return partial(lambda z, y, xb, dzr, dyr, o=0: (
                z + dzr[o], y + dyr[o], 0, xb), o=o)

        # own outputs get the x-block as its OWN array axis: a flat
        # (1, 1, 8, lbrow) block inside (cz, cy, 8, lrow) has a last-dim
        # block of bx*cap, which Mosaic rejects unless it is a multiple
        # of 128 or the full axis (measured at 524k: cap 40, bx 13 ->
        # 520 lanes).  (cz, cy, nxb, 8, lbrow) makes the block span the
        # full final axis.
        _own_out_map = lambda z, y, xb, dzr, dyr: (z, y, xb, 0, 0)  # noqa: E731
        _j_out_map = lambda z, y, xb, dzr, dyr: (z, y, 0, 0, xb)  # noqa: E731

    in_specs = []
    inputs = []
    for k in own_names:
        f = own_cols[k].shape[-1]
        in_specs.append(pl.BlockSpec(
            (1, 1, lbrow, f), _own_map(),
            memory_space=pltpu.VMEM))
        inputs.append(own_cols[k])
    for k in wrow_names:
        for o in range(n_off):
            in_specs.append(pl.BlockSpec(
                (1, 1, 1, lbwin), _win_map(o),
                memory_space=pltpu.VMEM))
            inputs.append(cand_wrows[k])
    for k in wcolt_names:
        f = cand_wcolsT[k].shape[2]
        for o in range(n_off):
            in_specs.append(pl.BlockSpec(
                (1, 1, f, lbwin), _win_map(o),
                memory_space=pltpu.VMEM))
            inputs.append(cand_wcolsT[k])

    own_blk = (1, 1, 8, lbrow) if nxb == 1 else (1, 1, 1, 8, lbrow)
    own_shape = ((cz, cy, 8, lrow) if nxb == 1
                 else (cz, cy, nxb, 8, lbrow))
    own_out_specs = [
        pl.BlockSpec(own_blk, _own_out_map, memory_space=pltpu.VMEM)
        for _ in range(num_own_out)
    ]
    j_out_specs = [
        pl.BlockSpec((1, 1, n_off, 1, lbwin), _j_out_map,
                     memory_space=pltpu.VMEM)
        for _ in range(num_j_out)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid_dims,
        in_specs=in_specs,
        out_specs=tuple(own_out_specs + j_out_specs),
        scratch_shapes=[pltpu.VMEM((lbrow, 8), dtype)
                        for _ in range(num_own_out)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            [jax.ShapeDtypeStruct(own_shape, dtype)
             for _ in range(num_own_out)]
            + [jax.ShapeDtypeStruct((cz, cy, n_off, 1, lwin), dtype)
               for _ in range(num_j_out)]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * len(grid_dims)),
        interpret=interpret,
    )(dz_arr, dy_arr, *inputs)

    if nxb == 1:
        own_accs = tuple(
            a[:, :, 0, :].reshape(cz, cy, cx, cap)
            for a in outs[:num_own_out]
        )
    else:
        # [cz, cy, nxb, 8, bx*cap] -> row 0 of the 8-pad, xb-major x order
        own_accs = tuple(
            a[:, :, :, 0, :].reshape(cz, cy, cx, cap)
            for a in outs[:num_own_out]
        )
    ext_accs = tuple(
        fold_window_j(dims, radius, cap, lane_w, jw)
        for jw in outs[num_own_out:]
    )
    return own_accs, ext_accs
