# SPDX-License-Identifier: Apache-2.0
"""Fused Pallas row-sweep: pair interactions with zero HBM intermediates.

The jnp row sweep (grid.grid_row_reduce_sym) materializes every pair-block
intermediate in HBM — XLA reports ~31 GB of traffic for the D3 direct pass
at 110k atoms.  This harness runs the same sweep as a Mosaic kernel: one
program per (own row (z, y), cell offset (dz, dy)), with the whole row's
planes VMEM-resident and the per-x pair blocks living entirely in
registers/VMEM.  HBM traffic collapses to one read of each plane per
offset plus the accumulator outputs (~2 GB).

Layouts (prepared by the caller, all fat-laned):

- own scalar planes   [cz, cy, cap, cx]          (to_own_scalar_layout)
- own feature planes  [cz, cy, F, cx*width]      (features on sublanes)
- cand scalar planes  [ez, ey, 1, ex*cap]        (whole ext row on lanes)
- cand feature planes [ez, ey, F, ex*cap]

Per x (unrolled), the kernel sees
- own columns  [cap, 1]   (block transposed once per program)
- cand windows [1, W]     with W = (2*rx+1)*cap   (static lane slices)
- own features [F, cap], cand features [F, W]
and a user ``body`` computes the pair block [cap, W], returning per-own
deltas ([cap, 1] each) and j-side deltas ([1, W] each).  The home offset
runs as a separate call with W = (rx+1)*cap and an upper-triangle mask on
the first chunk — pairs are counted exactly once, j-side contributions are
folded back through the halo by the caller (grid.fold_halo), mirroring
grid_row_reduce_sym's contract.

Mosaic notes (all probed on real hardware): small 2-D transposes,
``dot_general`` contracting dim 0 of both operands, unaligned static lane
slices, and ``ref[...] += value`` accumulation are supported; ``.at[].add``
on values (scatter-add) is not — accumulators are refs.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvalchemiops_tpu.types import INDEX_DTYPE


def _halfspace_zy(rz, ry):
    offs = []
    for dz in range(-rz, rz + 1):
        for dy in range(-ry, ry + 1):
            if dz > 0 or (dz == 0 and dy > 0):
                offs.append((dz, dy))
    return offs


def to_own_scalar_layout(plane):
    """[cz, cy, cx, cap] -> [cz, cy, cap, cx] (per-x columns on lanes).

    Pre-transposing in HBM keeps the kernel free of per-program 2-D
    transposes (Mosaic lowers those to slow shuffle sequences).
    """
    return jnp.swapaxes(plane, 2, 3)


def to_cand_layout(ext_plane):
    """[ez, ey, ex, cap(, F)] -> [ez, ey, F|1, ex*cap] (row-on-lanes)."""
    ez, ey, ex, cap = ext_plane.shape[:4]
    if ext_plane.ndim == 4:
        return ext_plane.reshape(ez, ey, 1, ex * cap)
    f = ext_plane.shape[4]
    return jnp.moveaxis(ext_plane, 4, 2).reshape(ez, ey, f, ex * cap)


def to_own_feature_layout(plane):
    """[cz, cy, cx, cap, F] -> [cz, cy, F, cx*cap]."""
    cz, cy, cx, cap, f = plane.shape
    return jnp.moveaxis(plane, 4, 2).reshape(cz, cy, f, cx * cap)


def _tri_mask(cap: int, nchunks: int):
    """Home-window mask [cap, nchunks*cap]: chunk 0 upper-triangle, rest all."""
    row = jax.lax.broadcasted_iota(INDEX_DTYPE, (cap, nchunks * cap), 0)
    col = jax.lax.broadcasted_iota(INDEX_DTYPE, (cap, nchunks * cap), 1)
    return (col >= cap) | (row < col)


def row_sweep(
    grid_dims,
    grid_radius,
    cap: int,
    own_scalars: dict,
    own_features: dict,
    cand_scalars: dict,
    cand_features: dict,
    body,
    num_own_out: int,
    num_j_out: int,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Run ``body`` over all symmetric pair blocks; see module docstring.

    ``body(own_cols, cand_wins, own_feats, cand_feats, pair_mask)`` gets
    dicts keyed like the input plane dicts and must return
    ``(own_deltas, j_deltas)`` — tuples of [cap, 1] and [1, W] arrays.
    ``pair_mask`` is a [cap, W] bool (home triangle) or None.

    Returns ``(own_accs, ext_accs)``: ``num_own_out`` interior planes
    [cz, cy, cx, cap] and ``num_j_out`` extended accumulator planes
    [ez, ey, ex, cap] holding all j-side deltas (caller folds the halo).
    """
    cz, cy, cx = grid_dims
    rz, ry, rx = grid_radius
    ez, ey, ex = cz + 2 * rz, cy + 2 * ry, cx + 2 * rx
    w_off = (2 * rx + 1) * cap
    w_home = (rx + 1) * cap
    offs = _halfspace_zy(rz, ry)
    n_off = len(offs)
    dz_arr = jnp.asarray([o[0] + rz for o in offs], INDEX_DTYPE)
    dy_arr = jnp.asarray([o[1] + ry for o in offs], INDEX_DTYPE)

    own_s_names = sorted(own_scalars)
    own_f_names = sorted(own_features)
    cand_s_names = sorted(cand_scalars)
    cand_f_names = sorted(cand_features)

    def make_kernel(home: bool):
        w_win = w_home if home else w_off
        nchunks = (rx + 1) if home else (2 * rx + 1)
        # ext lane offset of chunk 0 for own cell x: home starts at the own
        # cell itself (dxoff 0 -> ext x + rx), offsets span dxoff -rx..rx
        x_base = rx if home else 0

        def kernel(*refs):
            tri = _tri_mask(cap, nchunks) if home else None
            if not home:
                refs = refs[2:]  # dz/dy scalar-prefetch refs (used by index maps)
            n_in = len(own_s_names) + len(own_f_names) + len(cand_s_names) + len(cand_f_names)
            in_refs = refs[:n_in]
            out_refs = refs[n_in:n_in + num_own_out + num_j_out]
            scratch = refs[n_in + num_own_out + num_j_out:]
            it = iter(in_refs)
            own_s_refs = {k: next(it) for k in own_s_names}
            own_f_refs = {k: next(it) for k in own_f_names}
            cand_s_refs = {k: next(it) for k in cand_s_names}
            cand_f_refs = {k: next(it) for k in cand_f_names}
            own_out_refs = out_refs[:num_own_out]
            j_out_refs = out_refs[num_own_out:]
            own_acc = scratch[:num_own_out]
            j_acc = scratch[num_own_out:]

            # own scalar planes arrive pre-transposed [cap, cx]
            own_t = {k: r[0, 0] for k, r in own_s_refs.items()}

            for a in own_acc:
                a[:] = jnp.zeros(a.shape, dtype)
            for a in j_acc:
                a[:] = jnp.zeros(a.shape, dtype)

            # features may pack several blocks per cell (slot width > cap)
            own_fw = {k: own_features[k].shape[3] // cx for k in own_f_names}
            cand_fw = {k: cand_features[k].shape[3] // ex for k in cand_f_names}
            for x in range(cx):
                lane0 = (x + x_base) * cap
                own_cols = {k: v[:, x:x + 1] for k, v in own_t.items()}
                cand_wins = {
                    k: r[0, 0, :, lane0:lane0 + w_win]
                    for k, r in cand_s_refs.items()
                }
                own_feats = {
                    k: r[0, 0, :, x * own_fw[k]:(x + 1) * own_fw[k]]
                    for k, r in own_f_refs.items()
                }
                cand_feats = {
                    k: r[0, 0, :, (x + x_base) * cand_fw[k]:
                       (x + x_base + nchunks) * cand_fw[k]]
                    for k, r in cand_f_refs.items()
                }
                own_d, j_d = body(own_cols, cand_wins, own_feats, cand_feats, tri)
                for a, d in zip(own_acc, own_d):
                    a[:, x:x + 1] += d
                for a, d in zip(j_acc, j_d):
                    a[:, lane0:lane0 + w_win] += d

            first = True if home else pl.program_id(2) == 0
            @pl.when(first)
            def _():
                for r in own_out_refs:
                    r[0, 0] = jnp.zeros_like(r[0, 0])
            for r, a in zip(own_out_refs, own_acc):
                r[0, 0] += a[:]
            for r, a in zip(j_out_refs, j_acc):
                if home:
                    r[0, 0] = a[:]
                else:
                    r[0, 0, 0] = a[:]

        return kernel

    def specs(home: bool):
        if home:
            grid = (cz, cy)
            zy = lambda z, y: (z, y)
            czy = lambda z, y: (z + rz, y + ry)
            jout_block = (1, 1, 1, ex * cap)
            jout_idx = lambda z, y: (z, y, 0, 0)
            oout_idx = zy
        else:
            # scalar-prefetch refs (dz, dy tables) are appended to index-map args
            grid = (cz, cy, n_off)
            zy = lambda z, y, o, dzr, dyr: (z, y)
            czy = lambda z, y, o, dzr, dyr: (z + dzr[o], y + dyr[o])
            jout_block = (1, 1, 1, 1, ex * cap)
            jout_idx = lambda z, y, o, dzr, dyr: (z, y, o, 0, 0)
            oout_idx = zy
        in_specs = []
        for _ in own_s_names:
            in_specs.append(pl.BlockSpec(
                (1, 1, cap, cx), lambda *a, _f=zy: _f(*a) + (0, 0),
                memory_space=pltpu.VMEM))
        for k in own_f_names:
            f, wtot = own_features[k].shape[2], own_features[k].shape[3]
            in_specs.append(pl.BlockSpec(
                (1, 1, f, wtot), lambda *a, _f=zy: _f(*a) + (0, 0),
                memory_space=pltpu.VMEM))
        for _ in cand_s_names:
            in_specs.append(pl.BlockSpec(
                (1, 1, 1, ex * cap), lambda *a, _f=czy: _f(*a) + (0, 0),
                memory_space=pltpu.VMEM))
        for k in cand_f_names:
            f, wtot = cand_features[k].shape[2], cand_features[k].shape[3]
            in_specs.append(pl.BlockSpec(
                (1, 1, f, wtot), lambda *a, _f=czy: _f(*a) + (0, 0),
                memory_space=pltpu.VMEM))
        own_out_specs = [
            pl.BlockSpec((1, 1, cap, cx), lambda *a, _f=oout_idx: _f(*a) + (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(num_own_out)
        ]
        j_out_specs = [
            pl.BlockSpec(jout_block, jout_idx, memory_space=pltpu.VMEM)
            for _ in range(num_j_out)
        ]
        return grid, in_specs, own_out_specs, j_out_specs

    def run(home: bool):
        w_win = w_home if home else w_off
        grid, in_specs, own_out_specs, j_out_specs = specs(home)
        own_out_shapes = [
            jax.ShapeDtypeStruct((cz, cy, cap, cx), dtype)
            for _ in range(num_own_out)
        ]
        if home:
            j_out_shapes = [
                jax.ShapeDtypeStruct((cz, cy, 1, ex * cap), dtype)
                for _ in range(num_j_out)
            ]
        else:
            j_out_shapes = [
                jax.ShapeDtypeStruct((cz, cy, n_off, 1, ex * cap), dtype)
                for _ in range(num_j_out)
            ]
        scratch = (
            [pltpu.VMEM((cap, cx), dtype) for _ in range(num_own_out)]
            + [pltpu.VMEM((1, ex * cap), dtype) for _ in range(num_j_out)]
        )
        inputs = (
            [own_scalars[k] for k in own_s_names]
            + [own_features[k] for k in own_f_names]
            + [cand_scalars[k] for k in cand_s_names]
            + [cand_features[k] for k in cand_f_names]
        )
        if home:
            outs = pl.pallas_call(
                make_kernel(home),
                grid=grid,
                out_shape=tuple(own_out_shapes + j_out_shapes),
                in_specs=in_specs,
                out_specs=tuple(own_out_specs + j_out_specs),
                scratch_shapes=scratch,
                interpret=interpret,
            )(*inputs)
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=in_specs,
                out_specs=tuple(own_out_specs + j_out_specs),
                scratch_shapes=scratch,
            )
            outs = pl.pallas_call(
                make_kernel(home),
                grid_spec=grid_spec,
                out_shape=tuple(own_out_shapes + j_out_shapes),
                interpret=interpret,
            )(dz_arr, dy_arr, *inputs)
        return outs[:num_own_out], outs[num_own_out:]

    own_home, j_home = run(True)
    own_off, j_off = run(False)

    own_accs = tuple(
        jnp.swapaxes(a + b, 2, 3) for a, b in zip(own_home, own_off)
    )

    ext_accs = []
    for jh, jo in zip(j_home, j_off):
        acc = jnp.zeros((ez, ey, ex * cap), dtype)
        acc = acc.at[rz:rz + cz, ry:ry + cy].add(jh[:, :, 0])
        for oi, (dz, dy) in enumerate(offs):
            acc = acc.at[dz + rz:dz + rz + cz, dy + ry:dy + ry + cy].add(
                jo[:, :, oi, 0]
            )
        ext_accs.append(acc.reshape(ez, ey, ex, cap))
    return own_accs, tuple(ext_accs)
