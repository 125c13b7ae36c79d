# SPDX-License-Identifier: Apache-2.0
"""Stage breakdown of build_mesh_tiles at the composite config.

Isolates: (a) binning (mesh coords + packed-key sort + rank scatter),
(b) banded-row construction (the one-hot routing matmuls), (c) the
[N, 6W] row scatter, vs the full build — to decide whether an in-kernel
smat construction is worth the surgery.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu import spline_windowed as sw  # noqa: E402
from nvalchemiops_tpu.mathops.math import apply_mat3  # noqa: E402
from nvalchemiops_tpu.neighborlist.neighbor_utils import bucket_ranks  # noqa: E402
from nvalchemiops_tpu.spline import bspline_weight, bspline_derivative  # noqa: E402
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402

N_REP = int(os.environ.get("PROBE_NREP", "38"))


def main():
    dtype = jnp.float32
    pos_np, cell_np, *_ = build_system(n_rep=N_REP)
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    mesh_dims = (128, 128, 128) if N_REP >= 24 else (32, 32, 32)
    cap = sw.observed_tile_capacity(pos, cell, mesh_dims)
    nx, ny, nz = mesh_dims
    tile, order = 8, 4
    n = pos.shape[0]
    print(f"N={n} mesh={mesh_dims} cap={cap}", flush=True)
    dep = perturb_positions()
    dims_f = jnp.asarray([nx, ny, nz], dtype)
    inv = jnp.linalg.inv(cell)

    def binning(p):
        frac = apply_mat3(p, inv)
        mc = frac * dims_f
        mc = mc - jnp.floor(mc / dims_f) * dims_f
        mc = jnp.where(mc >= dims_f, 0.0, mc)
        base = jnp.floor(mc).astype(INDEX_DTYPE)
        t = base // tile
        ntx, nty, ntz = nx // tile, ny // tile, nz // tile
        lin = (t[:, 0] * nty + t[:, 1]) * ntz + t[:, 2]
        rank, counts_max = bucket_ranks(lin, ntx * nty * ntz)
        flat_slot = jnp.where(rank >= cap, ntx * nty * ntz * cap,
                              lin * cap + rank)
        return jnp.sum(flat_slot), counts_max

    def weights_only(p):
        frac = apply_mat3(p, inv)
        mc = frac * dims_f
        mc = mc - jnp.floor(mc / dims_f) * dims_f
        mc = jnp.where(mc >= dims_f, 0.0, mc)
        theta = mc - jnp.floor(mc)
        i = jnp.arange(order, dtype=INDEX_DTYPE)
        off = jnp.floor(theta - (order - 2) * 0.5).astype(INDEX_DTYPE)
        u = (order * 0.5 + theta[..., None]
             - (i[None, None, :] + off[..., None]).astype(dtype))
        w = bspline_weight(u, order)
        dw = bspline_derivative(u, order)
        return jnp.sum(w) + jnp.sum(dw)

    def full(p):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, order, cap,
                                need_grad=True)
        return jnp.sum(t.smat), jnp.sum(t.flat_slot)

    def full_nograd(p):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, order, cap,
                                need_grad=False)
        return jnp.sum(t.smat), jnp.sum(t.flat_slot)

    for label, f in (
        ("binning (sort+slot) ", binning),
        ("weights only        ", weights_only),
        ("full build (grad)   ", full),
        ("full build (nograd) ", full_nograd),
    ):
        t = measure(f, dep, (pos,), iters=4)
        print(f"{label}: {t*1e3:8.2f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
