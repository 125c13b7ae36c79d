# SPDX-License-Identifier: Apache-2.0
"""Pallas TPU kernels for the separable PME spread/gather contractions.

The jnp formulation (spline.py:_separable_spread) materializes the
per-chunk outer product ``T = S_y (x) S_z`` in HBM and reads it back for the
MXU contraction — ~2x the mesh volume of HBM traffic per atom chunk.  These
kernels keep both ``T`` and the full mesh accumulator in VMEM for the whole
atom sweep:

    spread:  mesh[x, yz] += S_x[c, x]^T @ (S_y[c, y] * S_z[c, z])
    gather:  out[c] = rowsum( (S_x[c, :] @ mesh) * (S_y (x) S_z)[c, :] )

Grid: one program per atom chunk; the mesh block maps to the same VMEM
buffer on every step (sequential accumulation).  VMEM budget at 128^3 mesh,
chunk 64: mesh 8 MB + T 4 MB + axis blocks < 13 MB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spread_kernel(qsx_ref, sy_ref, sz_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    sy = sy_ref[:]  # [C, ny]
    sz = sz_ref[:]  # [C, nz]
    c, ny = sy.shape
    nz = sz.shape[1]
    t = (sy[:, :, None] * sz[:, None, :]).reshape(c, ny * nz)
    out_ref[:] += jnp.dot(
        qsx_ref[:].T, t, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_separable_spread(qsx, sy, sz, chunk: int = 64, interpret: bool = False):
    """mesh[x, y, z] = sum_n qsx[n, x] sy[n, y] sz[n, z] (mesh VMEM-resident).

    ``qsx`` is the charge-weighted x-axis matrix [N, nx]; returns
    [nx, ny, nz] float32.
    """
    n, nx = qsx.shape
    ny = sy.shape[1]
    nz = sz.shape[1]
    num_chunks = max(1, -(-n // chunk))
    n_pad = num_chunks * chunk
    qsx = jnp.pad(qsx, ((0, n_pad - n), (0, 0)))
    sy = jnp.pad(sy, ((0, n_pad - n), (0, 0)))
    sz = jnp.pad(sz, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        _spread_kernel,
        out_shape=jax.ShapeDtypeStruct((nx, ny * nz), jnp.float32),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, nz), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nx, ny * nz), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qsx.astype(jnp.float32), sy.astype(jnp.float32), sz.astype(jnp.float32))
    return out.reshape(nx, ny, nz)


def _gather_kernel(sx_ref, sy_ref, sz_ref, mesh_ref, out_ref):
    sy = sy_ref[:]
    sz = sz_ref[:]
    c, ny = sy.shape
    nz = sz.shape[1]
    t = (sy[:, :, None] * sz[:, None, :]).reshape(c, ny * nz)
    proj = jnp.dot(sx_ref[:], mesh_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out_ref[:] = jnp.sum(proj * t, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("chunk", "interpret"))
def pallas_separable_gather(mesh, sx, sy, sz, chunk: int = 64, interpret: bool = False):
    """out[n] = sum_xyz mesh[x,y,z] sx[n,x] sy[n,y] sz[n,z] (mesh VMEM-resident)."""
    n, nx = sx.shape
    ny = sy.shape[1]
    nz = sz.shape[1]
    num_chunks = max(1, -(-n // chunk))
    n_pad = num_chunks * chunk
    sx = jnp.pad(sx, ((0, n_pad - n), (0, 0)))
    sy = jnp.pad(sy, ((0, n_pad - n), (0, 0)))
    sz = jnp.pad(sz, ((0, n_pad - n), (0, 0)))
    mesh2 = mesh.reshape(nx, ny * nz).astype(jnp.float32)

    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, ny), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, nz), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, ny * nz), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        sx.astype(jnp.float32), sy.astype(jnp.float32), sz.astype(jnp.float32),
        mesh2,
    )
    return out.reshape(n_pad)[:n]
