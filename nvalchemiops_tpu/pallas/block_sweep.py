# SPDX-License-Identifier: Apache-2.0
"""Super-chunked Pallas block sweep: lane-aligned fused pair interactions.

Evolution of ``row_sweep`` driven by on-chip measurements: the per-cell
[cap, W] pair blocks of the first-generation kernel waste vector registers
(unaligned 3*cap lanes) and serialize a per-x Python loop.  This harness
instead pairs a *super-chunk* of G consecutive x-cells (M = G*cap rows,
a multiple of the 128-lane tile by construction when possible) against its
merged candidate window (W = (G+2*Rx)*cap lanes), so every pair block is a
fat [M, W] tile that lives entirely in VMEM:

- own per-atom data arrives as *column planes* ``[cz, cy, cx*cap, F]``
  (rows on sublanes): chunk slices [M, F] feed MXU contractions directly
  and scalar columns broadcast over lanes with no transposes;
- candidate per-atom data arrives both as *row planes* ``[ez, ey, ex*cap]``
  (window slices [1, W] broadcast over sublanes) and, for MXU features, as
  column planes ``[ez, ey, ex*cap, F]`` (window slices [W, F] are the
  contraction rhs);
- per-block reductions ride the MXU as ones-contractions
  (``ones[8, W] . blk -> [8, M]`` for the own side, ``ones[8, M] . blk ->
  [8, W]`` for the j side) — no [*, 1] lanes, no shuffles; with
  ``precision=HIGHEST`` the bf16 decomposition is f32-exact;
- the home (0, 0) offset runs inside the same ``pallas_call`` as offset
  index 0, filtered by a static pair-once iota mask
  (cand_flat > own_flat + Rx*cap) that is switched in by ``program_id``.

One program per (z-row, y-row, offset); the (2Rz+1)(2Ry+1)/2 half-space
(dz, dy) offsets index the candidate row planes through scalar-prefetched
tables.  Own accumulators revisit the same output block across the offset
grid dimension (sequential minormost dim), j-side accumulators are written
per offset into extended row planes the caller folds with
``grid.fold_halo``.

Reference counterpart: the per-thread cell sweeps of
``nvalchemiops/neighborlist/cell_list.py:372-556`` and the D3/electrostatics
pair kernels — re-blocked for the MXU/VPU instead of per-thread scalar
loops.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvalchemiops_tpu.types import INDEX_DTYPE

__all__ = ["block_sweep", "choose_super_chunk", "pack_columns"]


def _halfspace_zy(rz, ry):
    return [
        (dz, dy)
        for dz in range(-rz, rz + 1)
        for dy in range(-ry, ry + 1)
        if dz > 0 or (dz == 0 and dy > 0)
    ]


def choose_super_chunk(cx: int, cap: int, rx: int, vmem_budget_bytes: int = 6 << 20,
                       live_blocks: int = 8) -> int:
    """Divisor G of cx whose [G*cap, (G+2rx)*cap] f32 blocks fit VMEM.

    Prefers G with G*cap a multiple of 128 (aligned chunk starts), then
    M = G*cap closest to 128: M=128 fills the MXU's systolic dimension
    while keeping the candidate window W (the per-row work, which the
    super-chunk only widens) minimal.  Measured at 110k atoms / cap 32:
    G=4 (M=128) 33.4 ms vs G=16 (M=512) 37.5 ms vs G=1 (M=32) 60 ms for
    the D3 sweep.
    """
    divisors = [g for g in range(1, cx + 1) if cx % g == 0]
    best = None
    for g in divisors:
        m = g * cap
        w = (g + 2 * rx) * cap
        w_pad = -(-w // 128) * 128
        if m > 512 or m * w_pad * 4 * live_blocks > vmem_budget_bytes:
            continue
        aligned = m % 128 == 0
        key = (aligned, -abs(m - 128), m)
        if best is None or key > best[0]:
            best = (key, g)
    return best[1] if best else 1


def pack_columns(*planes):
    """Stack interior/ext planes [..., cap] into a column plane [..., rows, S].

    ``planes`` are [d0, d1, X, cap] arrays (interior [cz, cy, cx, cap] or
    extended [ez, ey, ex, cap]); returns [d0, d1, X*cap, S].
    """
    st = jnp.stack([p.astype(planes[0].dtype) for p in planes], axis=-1)
    d0, d1, x, cap, s = st.shape
    return st.reshape(d0, d1, x * cap, s)


def block_sweep(
    dims,
    radius,
    cap: int,
    own_cols: dict,
    cand_rows: dict,
    cand_cols: dict,
    body,
    num_own_out: int,
    num_j_out: int,
    G: int | None = None,
    dtype=jnp.float32,
    interpret: bool = False,
    cand_colsT: dict | None = None,
):
    """Run ``body`` over all symmetric super-chunk pair blocks.

    Parameters
    ----------
    own_cols : dict name -> [cz, cy, cx*cap, F] column planes (rows on
        sublanes).  Scalar per-atom data is a column plane with F == 1
        (pack several scalars with :func:`pack_columns`).
    cand_rows : dict name -> [ez, ey, ex*cap] row planes (values on lanes).
    cand_cols : dict name -> [ez, ey, ex*cap, F] column planes (MXU rhs;
        the body sees [W, F] slices and must contract lanes-vs-lanes,
        which Mosaic realizes with an in-kernel rhs transpose).
    cand_colsT : dict name -> [ez, ey, F, ex*cap] *pre-transposed* column
        planes: the body sees [F, W] slices, so ``lf [M, F] @ slice`` is a
        direct [M, K] x [K, W] matmul with no per-block transpose.  Merged
        into the body's ``cand_col`` dict (keys must not collide).
    body(own, cand_row, cand_col, pair_ok) -> (own_blocks, j_blocks):
        own[k] = [M, F_k]; cand_row[k] = [1, W]; cand_col[k] = [W, F_k];
        ``pair_ok`` [M, W] bool (False where the pair must not contribute:
        home-offset pair-once filtering).  Blocks must already be zero at
        masked/invalid slots; the harness reduces them with exact
        ones-contractions.  ``own_blocks`` row-sums become per-own-atom
        deltas, ``j_blocks`` column-sums become candidate-side deltas.
        A ``j_blocks`` entry may be ``("neg", blk)``: the harness negates
        *after* the column reduce ([1, W] instead of [M, W] — measured
        ~0.5 ms per saved [M, W] op at 110k atoms), so symmetric force
        blocks never materialize their negation.

    Returns ``(own_accs, ext_accs)``: tuples of [cz, cy, cx, cap] interior
    planes and [ez, ey, ex, cap] extended accumulators (fold with
    ``grid.fold_halo``).
    """
    cz, cy, cx = dims
    rz, ry, rx = radius
    ez, ey, ex = cz + 2 * rz, cy + 2 * ry, cx + 2 * rx
    if G is None:
        G = choose_super_chunk(cx, cap, rx)
    if cx % G:
        raise ValueError(f"G={G} must divide cx={cx}")
    m = G * cap
    w = (G + 2 * rx) * cap
    n_chunks = cx // G
    lrow = cx * cap
    lext = ex * cap

    offs = [(0, 0)] + _halfspace_zy(rz, ry)
    n_off = len(offs)
    dz_arr = jnp.asarray([o[0] + rz for o in offs], INDEX_DTYPE)
    dy_arr = jnp.asarray([o[1] + ry for o in offs], INDEX_DTYPE)

    cand_colsT = cand_colsT or {}
    own_names = sorted(own_cols)
    crow_names = sorted(cand_rows)
    ccol_names = sorted(cand_cols)
    ccolt_names = sorted(cand_colsT)

    hi_prec = jax.lax.Precision.HIGHEST

    def kernel(dzr, dyr, *refs):
        n_in = (len(own_names) + len(crow_names) + len(ccol_names)
                + len(ccolt_names))
        in_refs = refs[:n_in]
        out_refs = refs[n_in:n_in + num_own_out + num_j_out]
        scratch = refs[n_in + num_own_out + num_j_out:]
        it = iter(in_refs)
        own_refs = {k: next(it) for k in own_names}
        crow_refs = {k: next(it) for k in crow_names}
        ccol_refs = {k: next(it) for k in ccol_names}
        ccolt_refs = {k: next(it) for k in ccolt_names}
        own_out = out_refs[:num_own_out]
        j_out = out_refs[num_own_out:]

        o = pl.program_id(2)
        is_home = o == 0

        # pair-once mask for the home offset: keep cand_flat > own_flat
        row_i = jax.lax.broadcasted_iota(INDEX_DTYPE, (m, w), 0)
        col_j = jax.lax.broadcasted_iota(INDEX_DTYPE, (m, w), 1)
        tri = col_j > row_i + rx * cap
        pair_ok = tri | jnp.logical_not(is_home)

        @pl.when(is_home)
        def _():
            for a in scratch:
                a[:] = jnp.zeros((lrow, 8), dtype)
        for r in j_out:
            r[0, 0, 0] = jnp.zeros((1, lext), dtype)

        for g in range(n_chunks):
            s_own = g * m
            s_cand = g * m  # ext window base: own cell gG is ext cell gG
            own = {
                k: r[0, 0, s_own:s_own + m, :] for k, r in own_refs.items()
            }
            cand_row = {
                k: r[0, 0, 0:1, s_cand:s_cand + w] for k, r in crow_refs.items()
            }
            cand_col = {
                k: r[0, 0, s_cand:s_cand + w, :] for k, r in ccol_refs.items()
            }
            for k, r in ccolt_refs.items():
                cand_col[k] = r[0, 0, :, s_cand:s_cand + w]
            own_blocks, j_blocks = body(own, cand_row, cand_col, pair_ok)
            # exact VPU reductions: lane-reduce for the own side into a
            # [lrow, 8] scratch column, sublane-reduce for the j side
            for a, blk in zip(scratch, own_blocks):
                a[s_own:s_own + m, 0:1] += jnp.sum(blk, axis=1, keepdims=True)
            for r, blk in zip(j_out, j_blocks):
                if isinstance(blk, tuple) and blk[0] == "neg":
                    r[0, 0, 0, 0:1, s_cand:s_cand + w] += -jnp.sum(
                        blk[1], axis=0, keepdims=True)
                else:
                    r[0, 0, 0, 0:1, s_cand:s_cand + w] += jnp.sum(
                        blk, axis=0, keepdims=True)

        # last offset: one tiny exact transpose dot per accumulator
        # ([8, 8] identity contracted at HIGHEST — K=8, cost negligible)
        @pl.when(o == n_off - 1)
        def _():
            i8 = jnp.eye(8, dtype=dtype)
            for r, a in zip(own_out, scratch):
                r[0, 0] = jax.lax.dot_general(
                    i8, a[:], (((1,), (1,)), ((), ())),
                    precision=hi_prec, preferred_element_type=dtype,
                )

    def own_idx(z, y, o, dzr, dyr):
        return (z + rz, y + ry)

    def cand_idx(z, y, o, dzr, dyr):
        return (z + dzr[o], y + dyr[o])

    in_specs = []
    inputs = []
    for k in own_names:
        f = own_cols[k].shape[-1]
        in_specs.append(pl.BlockSpec(
            (1, 1, lrow, f),
            lambda z, y, o, dzr, dyr: (z, y, 0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(own_cols[k])
    for k in crow_names:
        # rank-4 with a unit sublane axis: Mosaic requires the last two
        # block dims to be (8k, 128k) or match the array dims
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, lext),
            lambda z, y, o, dzr, dyr: (z + dzr[o], y + dyr[o], 0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(cand_rows[k].reshape(ez, ey, 1, lext))
    for k in ccol_names:
        f = cand_cols[k].shape[-1]
        in_specs.append(pl.BlockSpec(
            (1, 1, lext, f),
            lambda z, y, o, dzr, dyr: (z + dzr[o], y + dyr[o], 0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(cand_cols[k])
    for k in ccolt_names:
        f = cand_colsT[k].shape[2]
        in_specs.append(pl.BlockSpec(
            (1, 1, f, lext),
            lambda z, y, o, dzr, dyr: (z + dzr[o], y + dyr[o], 0, 0),
            memory_space=pltpu.VMEM))
        inputs.append(cand_colsT[k])

    own_out_specs = [
        pl.BlockSpec((1, 1, 8, lrow),
                     lambda z, y, o, dzr, dyr: (z, y, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(num_own_out)
    ]
    j_out_specs = [
        pl.BlockSpec((1, 1, 1, 1, lext),
                     lambda z, y, o, dzr, dyr: (z, y, o, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(num_j_out)
    ]
    own_out_shapes = [
        jax.ShapeDtypeStruct((cz, cy, 8, lrow), dtype)
        for _ in range(num_own_out)
    ]
    j_out_shapes = [
        jax.ShapeDtypeStruct((cz, cy, n_off, 1, lext), dtype)
        for _ in range(num_j_out)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cz, cy, n_off),
        in_specs=in_specs,
        out_specs=tuple(own_out_specs + j_out_specs),
        scratch_shapes=[pltpu.VMEM((lrow, 8), dtype)
                        for _ in range(num_own_out)],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(own_out_shapes + j_out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(dz_arr, dy_arr, *inputs)

    own_accs = tuple(
        a[:, :, 0, :].reshape(cz, cy, cx, cap) for a in outs[:num_own_out]
    )
    ext_accs = []
    for jo in outs[num_own_out:]:
        acc = jnp.zeros((ez, ey, lext), dtype)
        for oi, (dz, dy) in enumerate(offs):
            acc = acc.at[dz + rz:dz + rz + cz, dy + ry:dy + ry + cy].add(
                jo[:, :, oi, 0]
            )
        ext_accs.append(acc.reshape(ez, ey, ex, cap))
    return own_accs, tuple(ext_accs)
