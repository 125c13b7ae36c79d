# SPDX-License-Identifier: Apache-2.0
"""Probe: decompose the assembled-hybrid D3 overhead with honest outputs.

hybrid3: hybrid[row] 30.9 / hybrid[stencil] 31.5 / xla 26.97 ms (incl
builds) at 110k/9A.  Round-1 part estimates (row p1+p2 11.7, stencil chain
5.7) consumed ONE output plane, letting XLA dead-code-eliminate the
energy/CN/decn work.  This probe re-measures each part consuming every
live output, plus the assembly increments.  One probe process on the chip.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    _extend_like,
    build_atom_grid,
    choose_grid_origin,
    estimate_grid_geometry,
    gather_from_grid,
    scatter_rows_to_grid,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
    _grid_d3_impl,
    element_c6_mask,
    grid_dftd3,
)
from nvalchemiops_tpu.stencil import (
    build_stencil_grid,
    choose_stencil_geometry,
    extend_stencil,
    scatter_to_stencil,
    stencil_cn_chain_forces,
)
from nvalchemiops_tpu.types import INDEX_DTYPE

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = 48, 3.0
gpts = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"),
                -1).reshape(-1, 3) * a
pos_np = gpts + rng.uniform(-0.2, 0.2, gpts.shape)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
pbc = np.array([True] * 3)
cutoff = 9.0

zmax = 16
numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
rcov = jnp.asarray(np.r_[0.0, rng.uniform(0.6, 1.2, zmax)], jnp.float32)
r4r2 = jnp.asarray(np.r_[0.0, rng.uniform(2.0, 5.0, zmax)], jnp.float32)
cna = jnp.asarray(
    np.vstack([np.zeros(5), np.cumsum(rng.uniform(0.3, 1.0, (zmax, 5)), 1)]),
    jnp.float32)
c6_np = rng.uniform(5.0, 40.0, (zmax + 1, zmax + 1, 5, 5))
c6_np[0] = 0.0
c6_np[:, 0] = 0.0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, jnp.float32)

dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n,
                                           target_occupancy=0.75)
origin_np, observed = choose_grid_origin(pos, cell, pbc, dims)
origin = jnp.asarray(origin_np, jnp.float32) if origin_np.any() else None
cap = max(int(np.ceil((observed + 1) / 8)) * 8,
          int(np.ceil(observed * 1.02 / 8)) * 8)
sdims, sradius, sorigin, socc = choose_stencil_geometry(pos, cell, pbc,
                                                        cutoff)
sorigin_j = None if not sorigin.any() else jnp.asarray(sorigin, jnp.float32)
print(f"N={n} dims={dims} cap={cap} stencil={sdims} occ={socc}", flush=True)

A1, A2, S6, S8, K1, K3 = 0.4, 4.2, 1.0, 1.8, 16.0, -4.0
mask_elem = element_c6_mask(c6)
mesh = cna.shape[1]
zmax1 = rcov.shape[0]
c6p = jnp.swapaxes(c6, 1, 2).reshape(zmax1, mesh, zmax1 * mesh)
cna_a = cna[numbers]
mask_a = mask_elem.astype(jnp.float32)[numbers]
c6p_a = c6p[numbers]
rcov_a = rcov[numbers]


def gbuild(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


def sbuild(p):
    return build_stencil_grid(p, cell, pbc, sdims, sradius, origin=sorigin_j)


def row_impl(p, cn_override, skip_chain):
    gg = gbuild(p)
    zf, rcov_pl, r4r2_pl = scatter_rows_to_grid(
        gg, (numbers.astype(jnp.float32), rcov_a, r4r2[numbers]))
    z_pl = zf.astype(INDEX_DTYPE)
    out = _grid_d3_impl(
        gg, z_pl, _extend_like(gg, z_pl, 0),
        rcov_pl, _extend_like(gg, rcov_pl, 0.0),
        r4r2_pl, _extend_like(gg, r4r2_pl, 0.0),
        cna_a, mask_a, c6p_a,
        jnp.asarray(cutoff, jnp.float32), jnp.asarray(A1, jnp.float32),
        jnp.asarray(A2, jnp.float32), jnp.asarray(S6, jnp.float32),
        jnp.asarray(S8, jnp.float32), jnp.asarray(K1, jnp.float32),
        jnp.asarray(K3, jnp.float32),
        gg.dims, gg.radius, gg.cap, int(mesh), int(zmax1),
        None, compute_virial=False,
        cn_a_override=cn_override, skip_chain=skip_chain, numbers_a=numbers)
    return gg, out


def t_ms(f, iters=3):
    return measure(f, dep, (pos,), iters=iters) * 1e3


# A) p1+p2, ONE output consumed (round-1 style: DCE headroom)
print(f"p12 f-only : {t_ms(lambda p: row_impl(p, None, True)[1][1]):7.2f}",
      flush=True)


# B) p1+p2, ALL outputs consumed (e, fx, fy, fz, cn, decn planes)
def p12_all(p):
    _, out = row_impl(p, None, True)
    return sum(jnp.sum(o) for o in out)


print(f"p12 all-out: {t_ms(p12_all):7.2f}", flush=True)


# C) B + decn gathered to atom-major (what the chain consumes)
def p12_gather(p):
    gg, out = row_impl(p, None, True)
    decn_a = gather_from_grid(gg, out[5])
    return sum(jnp.sum(o) for o in out[:5]) + jnp.sum(decn_a)


print(f"p12+gather : {t_ms(p12_gather):7.2f}", flush=True)

# D) stencil chain alone, fixed decn (honest output already — forces)
decn_fixed = jnp.asarray(rng.normal(size=n), jnp.float32)


def chain(p):
    sg = sbuild(p)
    rint = scatter_to_stencil(sg, rcov_a)
    planes = (rint, extend_stencil(sg, rint, 0.0))
    return jnp.sum(stencil_cn_chain_forces(sg, rcov_a, decn_fixed, cutoff,
                                           K1, rcov_planes=planes))


print(f"chain+sbld : {t_ms(chain):7.2f}", flush=True)


# E) manual assembly C+D in one jit (≈ hybrid minus the public-API glue)
def manual_hybrid(p):
    gg, out = row_impl(p, None, True)
    decn_a = gather_from_grid(gg, out[5])
    sg = sbuild(p)
    rint = scatter_to_stencil(sg, rcov_a)
    planes = (rint, extend_stencil(sg, rint, 0.0))
    cf = stencil_cn_chain_forces(sg, rcov_a, decn_a, cutoff, K1,
                                 rcov_planes=planes)
    return sum(jnp.sum(o) for o in out[:5]) + jnp.sum(cf)


print(f"manual hyb : {t_ms(manual_hybrid):7.2f}", flush=True)


# F) full xla path, all outputs (reference point)
def xla_all(p):
    gg = gbuild(p)
    e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                          A1, A2, S8, s6=S6, engine="xla")
    return e + jnp.sum(f) + jnp.sum(cn)


print(f"xla all-out: {t_ms(xla_all):7.2f}", flush=True)
print("done", flush=True)
