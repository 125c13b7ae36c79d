# SPDX-License-Identifier: Apache-2.0
"""Mosaic kernel for the windowed PME gather with gradients.

The jnp m-first gradient gather (spline_windowed.windowed_gather with
``with_gradient=True``) builds three [ntiles, cap, W*W] tensor-product
variants in HBM (~190 MB at 128^3/110k) plus their einsum outputs; this
kernel keeps every intermediate in VMEM — per tile chunk it loads the
axis-matrix block and the mesh window once, forms the (y (x) x) products
and the three [cap, W] MXU contractions in registers/VMEM, and writes
only the four [ntiles, cap] output planes (values, gx, gy, gz).

This is the memory-bound pattern where hand kernels pay off on TPU
(docs/tpu_kernel_design.md rule 8) — the VPU-bound pair sweeps are NOT
re-implemented here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_windowed_gather_grad", "pallas_spread_windows"]

_HI = jax.lax.Precision.HIGHEST


def _kernel(w_win: int, cap: int, chunk: int, smat_ref, win_ref,
            ry_ref, rx_ref, val_ref, gx_ref, gy_ref, gz_ref):
    w = w_win
    # One-hot expansion matrices (rule 6): Mosaic cannot shape-cast
    # [cap, w, w] -> [cap, w*w] for non-lane-aligned w (measured on chip:
    # "infer-vector-layout: unsupported shape cast" at w=12), so the
    # broadcast+reshape is a matmul against a constant instead.
    ry = ry_ref[...]                          # [W, W*W], ry[y, y*W+x] = 1
    rx = rx_ref[...]                          # [W, W*W], rx[x, y*W+x] = 1

    def expand_y(a):
        # a [cap, W] -> [cap, W*W] with value at (c, y*W + x) = a[c, y]
        return jax.lax.dot_general(
            a, ry, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    def expand_x(a):
        return jax.lax.dot_general(
            a, rx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    for g in range(chunk):
        s = smat_ref[g]                       # [cap, 6W]
        win = win_ref[g]                      # [W(z), W*W(y,x)]
        sx = s[:, 0 * w:1 * w]
        sy = s[:, 1 * w:2 * w]
        sz = s[:, 2 * w:3 * w]
        sdx = s[:, 3 * w:4 * w]
        sdy = s[:, 4 * w:5 * w]
        sdz = s[:, 5 * w:6 * w]
        ys, xs = expand_y(sy), expand_x(sx)
        tyx = ys * xs

        def q_of(t):
            # [cap, W*W] x [W*W, W(z)] -> [cap, W]
            return jax.lax.dot_general(
                t, win, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)

        q = q_of(tyx)
        qx = q_of(ys * expand_x(sdx))
        qy = q_of(expand_y(sdy) * xs)
        val_ref[g] = jnp.sum(q * sz, axis=-1)
        gx_ref[g] = jnp.sum(qx * sz, axis=-1)
        gy_ref[g] = jnp.sum(qy * sz, axis=-1)
        gz_ref[g] = jnp.sum(q * sdz, axis=-1)


@partial(jax.jit, static_argnames=("w_win", "chunk", "interpret"))
def _gather_grad_planes(smat, win, w_win: int, chunk: int = 8,
                        interpret: bool = False):
    """[t, cap, 6W] x [t, W, W*W] -> four [t, cap] planes."""
    t, cap, kw = smat.shape
    assert kw == 6 * w_win, (kw, w_win)
    while t % chunk:
        chunk //= 2
    grid = (t // chunk,)
    spec3 = lambda d1, d2: pl.BlockSpec(  # noqa: E731
        (chunk, d1, d2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((w_win, w_win * w_win), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((chunk, cap), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    w = w_win
    ys = jnp.arange(w)[:, None]
    flat = jnp.arange(w * w)[None, :]
    ry = (flat // w == ys).astype(smat.dtype)       # [W, W*W]
    rx = (flat % w == ys).astype(smat.dtype)        # [W, W*W]
    outs = pl.pallas_call(
        partial(_kernel, w_win, cap, chunk),
        grid=grid,
        in_specs=[spec3(cap, 6 * w_win), spec3(w_win, w_win * w_win),
                  const_spec, const_spec],
        out_specs=[out_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((t, cap), smat.dtype)] * 4,
        interpret=interpret,
    )(smat, win.reshape(t, w_win, w_win * w_win), ry, rx)
    return outs


def _spread_kernel(w_win: int, cap: int, chunk: int, smat_ref, qszt_ref,
                   ry_ref, rx_ref, win_ref):
    w = w_win
    ry = ry_ref[...]                          # [W, W*W], ry[y, y*W+x] = 1
    rx = rx_ref[...]                          # [W, W*W], rx[x, y*W+x] = 1
    for g in range(chunk):
        s = smat_ref[g]                       # [cap, kW]
        sx = s[:, 0 * w:1 * w]
        sy = s[:, 1 * w:2 * w]
        ys = jax.lax.dot_general(
            sy, ry, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
        xs = jax.lax.dot_general(
            sx, rx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
        tyx = ys * xs                         # [cap, W*W]
        # [W, cap] x [cap, W*W] -> [W, W*W]: the per-tile window
        win_ref[g] = jax.lax.dot_general(
            qszt_ref[g], tyx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)


@partial(jax.jit, static_argnames=("w_win", "k_blocks", "chunk", "interpret"))
def _spread_windows(smat, qszt, w_win: int, k_blocks: int, chunk: int = 16,
                    interpret: bool = False):
    """[t, cap, kW] x [t, W, cap] -> per-tile windows [t, W, W*W]."""
    t, cap, kw = smat.shape
    assert kw == k_blocks * w_win, (kw, k_blocks, w_win)
    while t % chunk:
        chunk //= 2
    grid = (t // chunk,)
    spec3 = lambda d1, d2: pl.BlockSpec(  # noqa: E731
        (chunk, d1, d2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    const_spec = pl.BlockSpec((w_win, w_win * w_win), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    w = w_win
    ys = jnp.arange(w)[:, None]
    flat = jnp.arange(w * w)[None, :]
    ry = (flat // w == ys).astype(smat.dtype)
    rx = (flat % w == ys).astype(smat.dtype)
    return pl.pallas_call(
        partial(_spread_kernel, w_win, cap, chunk),
        grid=grid,
        in_specs=[spec3(cap, kw), spec3(w_win, cap), const_spec, const_spec],
        out_specs=spec3(w_win, w_win * w_win),
        out_shape=jax.ShapeDtypeStruct((t, w_win, w_win * w_win),
                                       smat.dtype),
        interpret=interpret,
    )(smat, qszt, ry, rx)


def pallas_spread_windows(tiles, q_t, interpret: bool | None = None):
    """Per-tile spread windows [ntiles, W, W*W] in one fused Mosaic kernel.

    Drop-in for the jnp contraction inside ``windowed_spread`` (the fold
    chain stays in XLA): per tile chunk the axis-matrix block loads once,
    the (y (x) x) product and the [W, cap] x [cap, W*W] contraction stay
    in VMEM, and only the [ntiles, W, W*W] windows are written.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    qszt = jnp.swapaxes(q_t[..., None] * tiles.axis_mat(2), 1, 2)
    k_blocks = tiles.smat.shape[-1] // tiles.w_win
    return _spread_windows(tiles.smat, qszt, tiles.w_win, k_blocks,
                           interpret=bool(interpret))


def pallas_windowed_gather_grad(tiles, mesh, interpret: bool | None = None):
    """Drop-in for ``windowed_gather(tiles, mesh, with_gradient=True)``.

    Requires ``tiles.has_grad``.  Returns ``(values [N], grad_frac [N, 3])``
    identical (modulo MXU rounding) to the jnp path.
    """
    from nvalchemiops_tpu.spline_windowed import _extract_windows
    from nvalchemiops_tpu.types import INDEX_DTYPE

    if not tiles.has_grad:
        raise ValueError("tiles built with need_grad=False")
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    win = _extract_windows(mesh, tiles.tile)
    val, gx, gy, gz = _gather_grad_planes(
        tiles.smat, win, tiles.w_win, interpret=bool(interpret))
    stacked = jnp.stack([val, gx, gy, gz], axis=-1).reshape(-1, 4)
    rows = stacked[jnp.minimum(tiles.flat_slot.astype(INDEX_DTYPE),
                               stacked.shape[0] - 1)]
    return rows[:, 0], rows[:, 1:]
