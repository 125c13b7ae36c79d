# SPDX-License-Identifier: Apache-2.0
"""Current-pipeline PME stage breakdown at the composite config.

Cumulative stages so the deltas isolate: tile build (grad), + spread
(pallas windows + fold), + FFT/green/iFFT, + energy gather, + gradient
gather, and the full public E+F path for cross-checking.
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
from nvalchemiops_tpu.interactions.electrostatics.k_vectors import (  # noqa: E402
    generate_k_vectors_pme,
)
from nvalchemiops_tpu.interactions.electrostatics.pme import (  # noqa: E402
    _pme_reciprocal_impl, pme_green_structure_factor,
)

N_REP = int(os.environ.get("PROBE_NREP", "38"))


def main():
    dtype = jnp.float32
    pos_np, cell_np, _numbers, charges_np, *_ = build_system(n_rep=N_REP)
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    charges = jnp.asarray(charges_np, dtype)
    mesh_dims = (128, 128, 128) if N_REP >= 24 else (32, 32, 32)
    cap = sw.observed_tile_capacity(pos, cell, mesh_dims)
    print(f"N={pos.shape[0]} mesh={mesh_dims} tile_cap={cap}", flush=True)
    dep = perturb_positions()
    _, k_squared = generate_k_vectors_pme(cell, mesh_dims)
    green, sf_sq = pme_green_structure_factor(
        k_squared, mesh_dims, jnp.asarray(0.35, dtype), cell, 4)
    gf = (green / sf_sq)

    def conv(mesh):
        mf = jnp.fft.rfftn(mesh, norm="backward")
        return jnp.fft.irfftn(mf * gf, s=mesh_dims,
                              norm="forward").astype(dtype)

    def tiles_only(p):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, cap, need_grad=True)
        return jnp.sum(t.smat), jnp.sum(t.flat_slot)

    def plus_spread(p, engine):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, cap, need_grad=True)
        return jnp.sum(sw.windowed_spread(t, charges, engine=engine))

    def plus_fft(p):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, cap, need_grad=True)
        return jnp.sum(conv(sw.windowed_spread(t, charges, engine="pallas")))

    def plus_gather_e(p):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, cap, need_grad=True)
        pm = conv(sw.windowed_spread(t, charges, engine="pallas"))
        return jnp.sum(sw.windowed_gather(t, pm))

    def plus_gather_grad(p):
        t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, cap, need_grad=True)
        pm = conv(sw.windowed_spread(t, charges, engine="pallas"))
        raw, gfr = sw.windowed_gather(t, pm, with_gradient=True)
        return jnp.sum(raw), jnp.sum(gfr)

    def full(p):
        e, f, _ = _pme_reciprocal_impl(
            p, charges, cell.reshape(1, 3, 3), jnp.asarray([0.35], dtype),
            mesh_dims, 4, None, True, False, None, None,
            tile_capacity=cap, spread_engine="pallas")
        return e, f

    for label, f in (
        ("tiles (grad)        ", tiles_only),
        ("+spread xla         ", lambda p: plus_spread(p, "xla")),
        ("+spread pallas      ", lambda p: plus_spread(p, "pallas")),
        ("+fft/green/ifft     ", plus_fft),
        ("+gather E           ", plus_gather_e),
        ("+gather E+grad      ", plus_gather_grad),
        ("full E+F public     ", full),
    ):
        try:
            t = measure(f, dep, (pos,), iters=3)
            print(f"{label}: {t*1e3:8.2f} ms", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{label}: FAILED {type(exc).__name__}: {exc}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
