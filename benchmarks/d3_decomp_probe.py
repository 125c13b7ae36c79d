# SPDX-License-Identifier: Apache-2.0
"""Decompose grid-D3 cost: CN pass vs feature build vs direct pass vs chain pass,
and within the direct pass: geometry+mask only, +einsums, +damping math.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    estimate_grid_geometry, build_atom_grid, grid_row_reduce_sym, row_home_mask,
    scatter_to_grid, gather_from_grid, _extend_like, grid_coordination_numbers,
)

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = 48, 3.0
gpts = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"), -1).reshape(-1, 3) * a
pos_np = gpts + rng.uniform(-0.2, 0.2, gpts.shape)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
pbc = np.array([True] * 3)
cutoff = 9.0
zmax = 16
zm = (zmax + 1) * 5

dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n, target_occupancy=0.75)
cap = 48
cz, cy, cx = dims
g0 = build_atom_grid(pos, cell, pbc, dims, radius, cap)
print(f"N={n} dims={dims} cap={cap}", flush=True)

rcov_a = jnp.asarray(rng.uniform(0.6, 1.2, n), jnp.float32)
featL = jnp.asarray(rng.normal(size=(n, 2 * zm)), jnp.float32)   # l0|l1
featR = jnp.asarray(rng.normal(size=(n, zm)), jnp.float32)


def sweep(body_kind):
    @partial(jax.jit, static_argnames=())
    def run(p):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap)
        rcov_pl = scatter_to_grid(g, rcov_a)
        rcov_ext = _extend_like(g, rcov_pl, 0.0)
        upper = row_home_mask(cap, radius[2])
        extra_ext = [("rcov", rcov_ext)]
        extra_own = [("rcov", rcov_pl)]
        if body_kind in ("einsum", "einsum_only", "full"):
            def fp(vals):
                nslots = cz * cy * cx * cap
                buf = jnp.zeros((nslots + 1, vals.shape[-1]), jnp.float32)
                return buf.at[g.flat_slot].set(vals)[:-1].reshape(cz, cy, cx, cap, vals.shape[-1])
            lf = fp(featL)
            rf = fp(featR)
            extra_own.append(("lf", lf))
            extra_ext.append(("rf", _extend_like(g, rf, 0.0)))

        def kern(carry, own, cand, home):
            acc = carry
            dx = cand["px"][..., None, :] - own["px"][..., :, None]
            dy = cand["py"][..., None, :] - own["py"][..., :, None]
            dz = cand["pz"][..., None, :] - own["pz"][..., :, None]
            d2 = dx * dx + dy * dy + dz * dz
            ok = (own["valid"][..., :, None] & cand["valid"][..., None, :]
                  & (d2 < cutoff * cutoff) & (d2 > 1e-20))
            if home:
                ok &= upper
            inv_r = jax.lax.rsqrt(jnp.where(ok, d2, 1.0))
            if body_kind == "geom":
                f = jnp.where(ok, inv_r, 0.0)
            elif body_kind == "cn":
                rc = own["rcov"][..., :, None] + cand["rcov"][..., None, :]
                f = jnp.where(ok, 1.0 / (1.0 + jnp.exp(-16.0 * (rc * inv_r - 1.0))), 0.0)
            elif body_kind in ("einsum", "einsum_only"):
                zacc = jnp.einsum("...if,...jf->...ij", own["lf"][..., :zm], cand["rf"])
                z_di = jnp.einsum("...if,...jf->...ij", own["lf"][..., zm:], cand["rf"])
                if body_kind == "einsum_only":
                    f = jnp.where(ok, zacc + z_di, 0.0)
                else:
                    c6 = zacc * jax.lax.reciprocal(jnp.where(ok, z_di, 1.0))
                    r2m = jnp.where(ok, d2, 1.0)
                    r4 = r2m * r2m
                    r6 = r4 * r2m
                    r8 = r4 * r4
                    den6 = jax.lax.reciprocal(r6 + 279.8)
                    den8 = jax.lax.reciprocal(r8 + 1234.5)
                    f = jnp.where(ok, -c6 * (den6 + 1.8 * den8), 0.0)
            return acc + jnp.sum(f, axis=-1), (jnp.sum(f, axis=-2),)

        zeros = jnp.zeros((cz, cy, cx, cap), jnp.float32)
        acc, (fold,) = grid_row_reduce_sym(g, kern, zeros, 1,
                                           extra_ext_planes=tuple(extra_ext),
                                           extra_own_planes=tuple(extra_own))
        return acc + fold
    return run


for kind in ["geom", "cn", "einsum_only", "einsum"]:
    t = measure(sweep(kind), dep, (pos,), iters=3)
    print(f"{kind:12s}: {t*1e3:7.2f} ms", flush=True)
