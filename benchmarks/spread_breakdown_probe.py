# SPDX-License-Identifier: Apache-2.0
"""Probe: decompose windowed_spread / windowed_gather internal stages.

Round-1 data: single 110k/128^3 spread obs-cap 5.25 ms; batch 64x2000/32^3
build+spread 8.53 (tile build 1.72 -> spread ~6.8 ms) vs H100 full batch
PME E 5.76.  This probe splits the spread into tyx construction, the
per-tile einsum, and the fold chain, and the gather into window extraction
+ einsums, at both configs.  One probe process on the chip at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu import spline_windowed as sw

dep = perturb_positions()
rng = np.random.default_rng(0)


def decompose(tag, n, box, mesh, batch):
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    cap = sw.observed_tile_capacity(pos, cell, mesh)
    print(f"[{tag}] n={n} mesh={mesh} cap={cap}", flush=True)

    def tiles_of(p, need_grad):
        return sw.build_mesh_tiles(p, cell, mesh, 4, cap, need_grad=need_grad)

    t = measure(lambda p: tiles_of(p, False), dep, (pos,), iters=4)
    print(f"  tile build (no grad): {t*1e3:7.2f} ms", flush=True)
    t = measure(lambda p: tiles_of(p, True), dep, (pos,), iters=4)
    print(f"  tile build (grad)   : {t*1e3:7.2f} ms", flush=True)

    def tyx_only(p):
        tl = tiles_of(p, False)
        return sw._tyx(tl, 1, 0)

    t_tyx = measure(tyx_only, dep, (pos,), iters=4)
    print(f"  build+tyx           : {t_tyx*1e3:7.2f} ms", flush=True)

    def through_einsum(p):
        tl = tiles_of(p, False)
        ntiles = tl.smat.shape[0]
        qbuf = jnp.zeros((ntiles * tl.cap + 1,), q.dtype)
        q_t = qbuf.at[tl.flat_slot].set(q)[:-1].reshape(ntiles, tl.cap)
        qsz = q_t[..., None] * tl.axis_mat(2)
        tyx = sw._tyx(tl, 1, 0)
        return jnp.einsum("tcz,tcm->tzm", qsz, tyx,
                          precision=jax.lax.Precision.HIGHEST)

    t_ein = measure(through_einsum, dep, (pos,), iters=4)
    print(f"  build+tyx+einsum    : {t_ein*1e3:7.2f} ms", flush=True)

    def full_spread(p):
        tl = tiles_of(p, False)
        return sw.windowed_spread(tl, q)

    t_sp = measure(full_spread, dep, (pos,), iters=4)
    print(f"  build+spread (fold) : {t_sp*1e3:7.2f} ms", flush=True)

    mesh_vals = jax.block_until_ready(
        sw.windowed_spread(tiles_of(pos, True), q))

    def gather_e(p):
        tl = tiles_of(p, True)
        return sw.windowed_gather(tl, mesh_vals)

    t_g = measure(gather_e, dep, (pos,), iters=4)
    print(f"  build(grad)+gather E: {t_g*1e3:7.2f} ms", flush=True)

    def gather_f(p):
        tl = tiles_of(p, True)
        return sw.windowed_gather(tl, mesh_vals, with_gradient=True)

    t_gf = measure(gather_f, dep, (pos,), iters=4)
    print(f"  build(grad)+gather F: {t_gf*1e3:7.2f} ms", flush=True)


decompose("single 110k/128^3", 110592, 144.0, (128, 128, 128), None)
decompose("one-of-batch 2k/32^3", 2000, 26.0, (32, 32, 32), None)

# batched: vmap over 64 systems of the 2k/32^3 case
B, npa, box, mesh = 64, 2000, 26.0, (32, 32, 32)
pos_b = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q_b = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
cell = jnp.asarray(np.eye(3) * box, jnp.float32)
cap_b = sw.observed_tile_capacity(pos_b[0], cell, mesh) + 16
print(f"[batch 64x2000/32^3] cap={cap_b}", flush=True)


def b_tiles(p, need_grad):
    return jax.vmap(
        lambda pp: sw.build_mesh_tiles(pp, cell, mesh, 4, cap_b,
                                       need_grad=need_grad))(p)


t = measure(lambda p: b_tiles(p, False), dep, (pos_b,), iters=4)
print(f"  tile build (no grad): {t*1e3:7.2f} ms", flush=True)


def b_spread(p):
    return jax.vmap(
        lambda pp, qq: sw.windowed_spread(
            sw.build_mesh_tiles(pp, cell, mesh, 4, cap_b, need_grad=False),
            qq))(p, q_b)


t = measure(b_spread, dep, (pos_b,), iters=4)
print(f"  build+spread        : {t*1e3:7.2f} ms", flush=True)


def b_tyx_einsum(p):
    def one(pp, qq):
        tl = sw.build_mesh_tiles(pp, cell, mesh, 4, cap_b, need_grad=False)
        ntiles = tl.smat.shape[0]
        qbuf = jnp.zeros((ntiles * tl.cap + 1,), qq.dtype)
        q_t = qbuf.at[tl.flat_slot].set(qq)[:-1].reshape(ntiles, tl.cap)
        qsz = q_t[..., None] * tl.axis_mat(2)
        tyx = sw._tyx(tl, 1, 0)
        return jnp.einsum("tcz,tcm->tzm", qsz, tyx,
                          precision=jax.lax.Precision.HIGHEST)
    return jax.vmap(one)(p, q_b)


t = measure(b_tyx_einsum, dep, (pos_b,), iters=4)
print(f"  build+tyx+einsum    : {t*1e3:7.2f} ms", flush=True)
print("done", flush=True)
