# SPDX-License-Identifier: Apache-2.0
"""Stage decomposition of the batched windowed PME at the matched config.

64 x 2000 atoms / 32^3 mesh / tile 16 (the winning auto config, 8.7 ms E
vs H100 5.76).  Times cumulative pipelines and differences them:

    tiles-only -> +spread -> full E -> full E+F

to locate the 2.9 ms gap (round-3 VERDICT weak #5 names the tile build
as suspect).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from nvalchemiops_tpu import spline_windowed as sw  # noqa: E402
from nvalchemiops_tpu.interactions.electrostatics.pme import (  # noqa: E402
    batch_pme_reciprocal,
)

dep = perturb_positions()
rng = np.random.default_rng(5)
B, npa, box = 64, 2000, 27.0
mesh = (32, 32, 32)
tile = 16
alpha = 0.35
pos = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
cell = jnp.asarray(np.eye(3) * box, jnp.float32)
cap = sw.mesh_tile_capacity(npa, mesh, tile=tile)
print(f"B={B} npa={npa} mesh={mesh} tile={tile} cap={cap}", flush=True)

# warmup throwaway
_ = measure(lambda p: jnp.sum(p * p), dep, (pos,), iters=8)


@jax.jit
def tiles_only(p):
    t = jax.vmap(lambda pp: sw.build_mesh_tiles(pp, cell, mesh, 4, cap,
                                                tile=tile))(p)
    return t.flat_slot.sum()


@jax.jit
def tiles_spread(p):
    def one(pp, qq):
        t = sw.build_mesh_tiles(pp, cell, mesh, 4, cap, tile=tile)
        return sw.windowed_spread(t, qq)
    return jax.vmap(one)(p, q)


def full_e(p):
    return batch_pme_reciprocal(p, q, cell, alpha, mesh,
                                tile_capacity=cap, tile=tile,
                                fft_mode="matmul")


def full_ef(p):
    return batch_pme_reciprocal(p, q, cell, alpha, mesh,
                                tile_capacity=cap, tile=tile,
                                fft_mode="matmul", compute_forces=True)[1]


def full_e_fft(p):
    return batch_pme_reciprocal(p, q, cell, alpha, mesh,
                                tile_capacity=cap, tile=tile,
                                fft_mode="xla")


from nvalchemiops_tpu.spline import spline_spread
from nvalchemiops_tpu.interactions.electrostatics.pme import (
    batch_pme_reciprocal as bpr,
)


@jax.jit
def dense_spread(p):
    return jax.vmap(lambda pp, qq: spline_spread(
        pp, qq, cell, mesh_dims=mesh, spline_order=4))(p, q)


def dense_e(p):
    return bpr(p, q, cell, alpha, mesh, engine="dense", fft_mode="matmul")


def dense_ef(p):
    return bpr(p, q, cell, alpha, mesh, engine="dense", fft_mode="matmul",
               compute_forces=True)[1]


for name, fn in (("tiles", tiles_only), ("tiles+spread", tiles_spread),
                 ("full E (matmul)", full_e), ("full E (fft)", full_e_fft),
                 ("full E+F", full_ef),
                 ("dense spread", dense_spread),
                 ("dense E", dense_e), ("dense E+F", dense_ef)):
    t = measure(fn, dep, (pos,), iters=4)
    print(f"{name:18s}: {t*1e3:8.3f} ms", flush=True)
print("done", flush=True)
