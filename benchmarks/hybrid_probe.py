# SPDX-License-Identifier: Apache-2.0
"""Probe: decompose the hybrid D3 engine's measured overhead.

stack_probe measured the full hybrid at 38.9 ms where its parts should
sum to ~21 (stencil CN 4.3 + row pass 2 ~7.4 + stencil chain 7.4 +
epilogues) — this probe times each hybrid stage in isolation and in
combination to find where the extra ~16 ms lives.  One probe process on
the chip at a time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    build_atom_grid, choose_grid_origin, estimate_grid_geometry,
    gather_from_grid,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
    _grid_d3_impl, element_c6_mask, grid_dftd3,
)
from nvalchemiops_tpu.stencil import (
    build_stencil_grid, choose_stencil_geometry,
    stencil_cn_chain_forces, stencil_coordination_numbers,
)
from nvalchemiops_tpu.types import INDEX_DTYPE

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = int(os.environ.get("HYBRID_PROBE_NREP", "48")), 3.0
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
geo = choose_stencil_geometry(pos, cell, pbc, cutoff)
sdims, sradius, sorigin, socc = geo
sorigin_j = None if not sorigin.any() else jnp.asarray(sorigin, jnp.float32)
print(f"N={n} dims={dims} cap={cap} stencil={sdims} r={sradius} occ={socc}",
      flush=True)

rcov_a = rcov[numbers]
A1, A2, S6, S8, K1, K3 = 0.4, 4.2, 1.0, 1.8, 16.0, -4.0


def gbuild(p):
    return build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)


def sbuild(p):
    return build_stencil_grid(p, cell, pbc, sdims, sradius, origin=sorigin_j)


t_gb = measure(lambda p: gbuild(p).ext_px, dep, (pos,), iters=8)
print(f"grid build         : {t_gb*1e3:7.2f} ms", flush=True)
t_sb = measure(lambda p: sbuild(p).ext_px, dep, (pos,), iters=8)
print(f"stencil build      : {t_sb*1e3:7.2f} ms", flush=True)
t_both = measure(lambda p: (gbuild(p).ext_px, sbuild(p).ext_px)[0],
                 dep, (pos,), iters=8)
print(f"both builds        : {t_both*1e3:7.2f} ms", flush=True)

# stage A: stencil CN alone (incl stencil build)
def stage_cn(p):
    sg = sbuild(p)
    return stencil_coordination_numbers(sg, rcov_a, cutoff, K1)

t = measure(stage_cn, dep, (pos,), iters=3)
print(f"stencil CN (incl sb): {t*1e3:7.2f} ms", flush=True)
cn_a = stage_cn(pos)

# shared row-path prep (mirrors grid_dftd3's public prologue)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import element_cn_ref  # noqa
mask_elem = element_c6_mask(c6)
mesh = cna.shape[1]
zmax1 = rcov.shape[0]
c6p = jnp.swapaxes(c6, 1, 2).reshape(zmax1, mesh, zmax1 * mesh)
cna_a = cna[numbers]
mask_a = mask_elem.astype(jnp.float32)[numbers]
c6p_a = c6p[numbers]

from nvalchemiops_tpu.grid import scatter_rows_to_grid, _extend_like


def row_impl(p, cn_override, skip_chain):
    gg = gbuild(p)
    zf, rcov_pl, r4r2_pl = scatter_rows_to_grid(
        gg, (numbers.astype(jnp.float32), rcov[numbers], r4r2[numbers]))
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
    return out


# stage B: row passes 1+2 (no chain) — baseline for pass-2 isolation
t = measure(lambda p: row_impl(p, None, True)[1], dep, (pos,), iters=3)
print(f"row p1+p2 (incl gb): {t*1e3:7.2f} ms", flush=True)

# stage C: row pass 2 only (cn override), i.e. hybrid's middle
def stage_p2(p):
    return row_impl(p, cn_a, True)[1]

t = measure(stage_p2, dep, (pos,), iters=3)
print(f"row p2-only (incl gb): {t*1e3:7.2f} ms", flush=True)

# stage D: stencil chain alone (fixed decn input)
decn_a = jnp.asarray(rng.normal(size=n), jnp.float32)


def stage_chain(p):
    sg = sbuild(p)
    return stencil_cn_chain_forces(sg, rcov_a, decn_a, cutoff, K1)

t = measure(stage_chain, dep, (pos,), iters=3)
print(f"stencil chain (incl sb): {t*1e3:7.2f} ms", flush=True)

# stage D2: stencil engine comparison (pallas fullspace vs xla fold)
for eng in ("pallas", "stack", "fuse", "xla"):
    def cn_eng(p, e=eng):
        sg = sbuild(p)
        return stencil_coordination_numbers(sg, rcov_a, cutoff, K1, engine=e)

    def chain_eng(p, e=eng):
        sg = sbuild(p)
        return stencil_cn_chain_forces(sg, rcov_a, decn_a, cutoff, K1,
                                       engine=e)

    try:
        t1 = measure(cn_eng, dep, (pos,), iters=3)
        t2 = measure(chain_eng, dep, (pos,), iters=3)
        print(f"stencil CN/chain [{eng:6s}]: {t1*1e3:7.2f} / {t2*1e3:7.2f} ms",
              flush=True)
    except Exception as exc:
        print(f"stencil CN/chain [{eng:6s}]: failed {type(exc).__name__}",
              flush=True)

# stage E: full hybrid through the public API
def hybrid(p):
    gg = gbuild(p)
    sg = sbuild(p)
    e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                          A1, A2, S8, s6=S6, engine="hybrid", stencil=sg)
    return f

t_h = measure(hybrid, dep, (pos,), iters=3)
print(f"hybrid full (incl builds): {t_h*1e3:7.2f} ms", flush=True)

# stage F: manual hybrid assembly (isolate public-API plumbing)
def hybrid_manual(p):
    gg = gbuild(p)
    sg = sbuild(p)
    cn = stencil_coordination_numbers(sg, rcov_a, cutoff, K1)
    out = row_impl(p, cn, True)  # NOTE: rebuilds gg inside — same as stages
    decn = gather_from_grid(gg, out[5])
    return out[1] + 0.0, stencil_cn_chain_forces(sg, rcov_a, decn, cutoff, K1)

t_m = measure(lambda p: hybrid_manual(p)[1], dep, (pos,), iters=3)
print(f"hybrid manual (2 gbuilds): {t_m*1e3:7.2f} ms", flush=True)

# stage G: full xla for reference
def xla(p):
    gg = gbuild(p)
    e, f, cn = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                          A1, A2, S8, s6=S6, engine="xla")
    return f

t_x = measure(xla, dep, (pos,), iters=3)
print(f"xla full (incl gb) : {t_x*1e3:7.2f} ms", flush=True)
print("done", flush=True)
