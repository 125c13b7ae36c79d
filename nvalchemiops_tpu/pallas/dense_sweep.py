# SPDX-License-Identifier: Apache-2.0
"""Batched dense triangle-block Pallas pair sweep.

The dense minimum-image D3 path (interactions/dispersion/dense_d3.py) is
VPU-compute-bound: at the reference's matched batched config (128 x 2000
atoms, 21.2 A cutoff on ~41 A boxes) the XLA formulation evaluates every
[n, n] pair plane from BOTH sides — each of the three passes re-runs its
elementwise chain (logistic CN, BJ damping, chain rule) over n^2 slots per
image combo, twice per physical pair.

This harness halves that: each (i, j) pair block is visited ONCE.  Atoms
are tiled into ``block``-row blocks; a scalar-prefetched table enumerates
the B*(B+1)/2 upper-triangle block pairs; the body computes one
[block, block] pair tile and hands back per-output planes that are
reduced BOTH ways (lane-reduce into the i rows, sublane-reduce into the
j rows).  Per-system accumulators live in VMEM scratch across the
triangle sweep (sequential grid), written out once per system.

Layout contract (mirrors block_sweep/window_sweep conventions):

- i-side per-atom data arrives as column planes ``[S, n_pad, F]`` (rows
  on sublanes; slices [block, F] feed MXU contractions directly);
- j-side data arrives as pre-transposed row planes ``[S, F, n_pad]``
  (slices [F, block]: ``l [block, F] @ slice`` is a direct matmul, and
  F == 1 scalar rows broadcast over sublanes);
- per-system scalars (e.g. the 3x3 cell) ride scalar prefetch.

Reference counterpart: the batched DFT-D3 kernels over concatenated
small systems (reference nvalchemiops/interactions/dispersion/dftd3.py
batch path) — re-blocked as dense MXU/VPU pair tiles instead of
per-thread neighbor-matrix loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvalchemiops_tpu.types import INDEX_DTYPE

__all__ = ["dense_sweep", "triangle_blocks"]


def triangle_blocks(n_blocks: int) -> tuple[np.ndarray, np.ndarray]:
    """Upper-triangle block-pair enumeration (bi <= bj), diagonal first.

    Diagonal-first ordering keeps the (masked) diagonal tiles at the
    start of every system's sweep; correctness does not depend on the
    order — accumulation is associative per output slot.
    """
    pairs = [(b, b) for b in range(n_blocks)] + [
        (bi, bj)
        for bi in range(n_blocks)
        for bj in range(bi + 1, n_blocks)
    ]
    bi = np.asarray([p[0] for p in pairs], np.int32)
    bj = np.asarray([p[1] for p in pairs], np.int32)
    return bi, bj


def dense_sweep(
    i_cols: dict,
    j_rows: dict,
    body,
    num_out: int,
    scalars=None,
    block: int = 256,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Run ``body`` over all upper-triangle dense pair blocks per system.

    Parameters
    ----------
    i_cols : dict name -> [S, n_pad, F] i-side column planes.
    j_rows : dict name -> [S, F, n_pad] j-side (pre-transposed) row
        planes; scalar data uses F == 1.
    body(i, j, scal, pair_ok) -> list of ``num_out`` (i_blk, j_blk)
        tuples: ``i[k]`` = [block, F] slices, ``j[k]`` = [F, block]
        slices, ``scal`` = a callable ``k -> scalar`` reading this
        system's scalar row from SMEM (or None), ``pair_ok`` =
        [block, block] bool mask that is the
        strict upper triangle on diagonal block pairs and all-True
        elsewhere (the body must fold it into every validity test).
        Each ``i_blk`` ([block, block], lane-reduced into the i rows) and
        ``j_blk`` (sublane-reduced into the j rows) may be ``None`` (no
        contribution) or ``("neg", plane)`` (negated after the reduce —
        symmetric force blocks never materialize their negation).
    num_out : number of per-atom output accumulators.
    scalars : optional [S, K] float32 per-system scalar rows (SMEM).
    block : pair-tile edge; multiple of 128.  ``n_pad`` (from the input
        shapes) must be a multiple of ``block``.

    Returns ``num_out`` arrays [S, n_pad] of accumulated per-atom values.
    """
    if block % 128:
        raise ValueError(f"block={block} must be a multiple of 128")
    i_names = sorted(i_cols)
    j_names = sorted(j_rows)
    s_count, n_pad = i_cols[i_names[0]].shape[:2]
    if n_pad % block:
        raise ValueError(f"n_pad={n_pad} must be a multiple of block={block}")
    nb = n_pad // block
    bi_arr, bj_arr = triangle_blocks(nb)
    n_t = bi_arr.shape[0]
    have_scal = scalars is not None
    if have_scal:
        scalars = jnp.asarray(scalars, jnp.float32)

    def kernel(*refs):
        it = iter(refs)
        bi_r = next(it)
        bj_r = next(it)
        scal_r = next(it) if have_scal else None
        i_refs = {k: next(it) for k in i_names}
        j_refs = {k: next(it) for k in j_names}
        outs = [next(it) for _ in range(num_out)]
        scr_i = [next(it) for _ in range(num_out)]
        scr_j = [next(it) for _ in range(num_out)]

        s = pl.program_id(0)
        t = pl.program_id(1)
        bi = bi_r[t]
        bj = bj_r[t]

        @pl.when(t == 0)
        def _():
            for a in scr_i:
                a[:] = jnp.zeros((n_pad, 8), dtype)
            for a in scr_j:
                a[:] = jnp.zeros((8, n_pad), dtype)

        row = jax.lax.broadcasted_iota(INDEX_DTYPE, (block, block), 0)
        lane = jax.lax.broadcasted_iota(INDEX_DTYPE, (block, block), 1)
        pair_ok = (lane > row) | (bi != bj)

        i_sl = {k: r[0] for k, r in i_refs.items()}
        j_sl = {k: r[0] for k, r in j_refs.items()}
        scal = (lambda k: scal_r[s, k]) if have_scal else None
        blocks = body(i_sl, j_sl, scal, pair_ok)
        ioff = bi * block
        joff = bj * block
        for (i_blk, j_blk), ai, aj in zip(blocks, scr_i, scr_j):
            if i_blk is not None:
                neg_i = isinstance(i_blk, tuple) and i_blk[0] == "neg"
                red = jnp.sum(i_blk[1] if neg_i else i_blk,
                              axis=1, keepdims=True)
                ai[pl.ds(ioff, block), 0:1] += -red if neg_i else red
            if j_blk is not None:
                neg = isinstance(j_blk, tuple) and j_blk[0] == "neg"
                red = jnp.sum(j_blk[1] if neg else j_blk,
                              axis=0, keepdims=True)
                aj[0:1, pl.ds(joff, block)] += -red if neg else red

        @pl.when(t == n_t - 1)
        def _():
            i8 = jnp.eye(8, dtype=dtype)
            for r, ai, aj in zip(outs, scr_i, scr_j):
                # exact [8, 8] identity contraction transposes the i-side
                # column scratch; row 0 = i sums + j sums
                r[0] = jax.lax.dot_general(
                    i8, ai[:], (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=dtype,
                ) + aj[:]

    # index maps receive every scalar-prefetch ref as trailing args
    # (bi table, bj table, then the optional scalar rows) — take *pf
    in_specs = []
    inputs = []
    for k in i_names:
        f = i_cols[k].shape[-1]
        in_specs.append(pl.BlockSpec(
            (1, block, f),
            lambda s, t, *pf: (s, pf[0][t], 0),
            memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(i_cols[k]))
    for k in j_names:
        f = j_rows[k].shape[1]
        in_specs.append(pl.BlockSpec(
            (1, f, block),
            lambda s, t, *pf: (s, 0, pf[1][t]),
            memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(j_rows[k]))

    out_specs = tuple(
        pl.BlockSpec((1, 8, n_pad), lambda s, t, *pf: (s, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(num_out)
    )
    scratch = (
        [pltpu.VMEM((n_pad, 8), dtype) for _ in range(num_out)]
        + [pltpu.VMEM((8, n_pad), dtype) for _ in range(num_out)]
    )
    prefetch = [jnp.asarray(bi_arr), jnp.asarray(bj_arr)]
    if have_scal:
        prefetch.append(scalars)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(s_count, n_t),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((s_count, 8, n_pad), dtype)
            for _ in range(num_out)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # block=256 with image combos sits right at the default 16 MB
            # scoped-VMEM ceiling (compiles measured both sides of it in
            # round 4: 57.4 ms when it fit, 18.16 MB OOM when scheduling
            # went the other way).  Raise the ceiling so the fastest
            # proven block is deterministic; v5e VMEM is 128 MB total.
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*prefetch, *inputs)
    return tuple(o[:, 0, :] for o in outs)
