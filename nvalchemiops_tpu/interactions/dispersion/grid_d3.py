"""DFT-D3(BJ) on the halo atom grid — the at-scale TPU path.

Same physics as ``dftd3.py`` (see its docstring for formulas and reference
citations), evaluated over ``nvalchemiops_tpu.grid.AtomGrid`` candidate
blocks so the hot loop contains no per-pair gathers:

- per-atom element data (rcov, r4r2, per-element reference CNs, and the
  atom's C6 row ``c6ab[z_i]``) is fetched once per atom (N-element gathers)
  and scattered into grid planes;
- per-pair C6 references are reconstructed with a z-contraction
  ``c6(i,j,p,q) = sum_z c6_row_i[z, pq] * [z_j == z]`` — a batched
  [cap, Z+1] x [Z+1, cap] matmul per cell per reference point, which the
  MXU eats instead of 25 serialized [N, K, 5, 5] gathers;
- the 5x5 interpolation uses the same online-LSE accumulation as
  ``_kernels.py``.

Structural requirement: the grid path assumes the physically-structured
reference tables of real DFT-D3 data, where ``cn_ref[zi, zj, p, q]``
depends only on ``(zi, p)`` (each element's reference-compound CNs).  The
general [Z, Z, 5, 5] form of the reference API is supported by the matrix
path; :func:`element_cn_ref` validates/extracts the structured form.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from nvalchemiops_tpu.types import INDEX_DTYPE
from nvalchemiops_tpu.grid import (
    AtomGrid,
    _extend_like,
    gather_from_grid,
    grid_row_reduce_sym,
    row_home_mask,
    scatter_to_grid,
)

__all__ = ["element_cn_ref", "grid_dftd3"]

NEG_BIG = -1e20


def element_cn_ref(cn_ref, atol=0.0):
    """Extract the element-structured CN reference table [Zmax+1, mesh].

    Real D3 data satisfies ``cn_ref[zi, zj, p, q] == cnA[zi, p]``; raises if
    the provided table is not of that form (use the matrix-path ``dftd3``
    for fully general tables).
    """
    cn_ref = np.asarray(jax.device_get(cn_ref))
    zmax1, _, mesh, _ = cn_ref.shape
    cand = cn_ref[:, 0, :, 0] if zmax1 == 1 else cn_ref[:, min(1, zmax1 - 1), :, 0]
    full = np.broadcast_to(cand[:, None, :, None], cn_ref.shape)
    if not np.allclose(full, cn_ref, atol=atol, rtol=0.0):
        raise ValueError(
            "cn_ref is not element-structured (cn_ref[zi, zj, p, q] must "
            "depend only on (zi, p)); use the matrix-path dftd3 instead"
        )
    return jnp.asarray(cand)


@partial(
    jax.jit,
    static_argnames=("dims", "radius", "cap", "mesh", "zmax1"),
)
def _grid_d3_impl(
    grid: AtomGrid,
    z_plane, z_ext,
    rcov_plane, rcov_ext,
    r4r2_plane, r4r2_ext,
    cna_plane, cna_ext,          # tuples of per-p planes [.., cap]
    c6row_plane,                 # [.., cap, zmax1*mesh^2] own-atom C6 rows (flat)
    cutoff, a1, a2, s6, s8, k1, k3,
    dims, radius, cap, mesh: int, zmax1: int,
):
    dtype = grid.ext_px.dtype
    cz, cy, cx = dims
    cutoff_sq = jnp.asarray(cutoff, dtype=dtype) ** 2

    def geom(own, cand):
        dx = cand["px"][..., None, :] - own["px"][..., :, None]
        dy = cand["py"][..., None, :] - own["py"][..., :, None]
        dz = cand["pz"][..., None, :] - own["pz"][..., :, None]
        d2 = dx * dx + dy * dy + dz * dz
        ok = (
            own["valid"][..., :, None]
            & cand["valid"][..., None, :]
            & (d2 < cutoff_sq)
            & (d2 > 1e-20)
            & (own["z"][..., :, None] != 0)
            & (cand["z"][..., None, :] != 0)
        )
        r = jnp.sqrt(jnp.where(ok, d2, 1.0))
        return ok, r, dx, dy, dz

    # ---- pass 1: coordination numbers (symmetric row sweep) --------------
    upper = row_home_mask(cap, radius[2])

    def cn_kern(cn, own, cand, home):
        ok, r, *_ = geom(own, cand)
        if home:
            ok &= upper
        rc = own["rcov"][..., :, None] + cand["rcov"][..., None, :]
        f = jnp.where(ok, 1.0 / (1.0 + jnp.exp(-k1 * (rc / r - 1.0))), 0.0)
        return cn + jnp.sum(f, axis=-1), (jnp.sum(f, axis=-2),)

    extra_ext = (("z", z_ext), ("rcov", rcov_ext))
    extra_own = (("z", z_plane), ("rcov", rcov_plane))
    cn_plane, (cn_fold,) = grid_row_reduce_sym(
        grid, cn_kern, jnp.zeros((cz, cy, cx, cap), dtype), 1,
        extra_ext_planes=extra_ext, extra_own_planes=extra_own,
    )
    cn_plane = cn_plane + cn_fold
    cn_ext = _extend_like(grid, cn_plane, 0.0)

    # ---- pass 2: energy, direct forces, dE/dCN ---------------------------
    #
    # The Gaussian interpolation factorizes EXACTLY over the reference grid:
    #   L_pq = exp(k3 (di_p^2 + dj_q^2)) = e_i[p] * e_j[q]
    # so every accumulator is a bilinear form in the per-atom 5-vectors
    #   e_i[p] = exp(k3 (CN_i - cnA_i[p])^2):
    #   w    = e_i^T M01[zi, zj] e_j        (M01 = [c6 != 0] mask table)
    #   z    = e_i^T C6 [zi, zj] e_j
    #   w_di = (e_i d_i)^T M01 e_j,   z_di = (e_i d_i)^T C6 e_j
    # With u_i[z, q] = sum_p T[zi, z, p, q] (e_i)_p precomputed per own atom
    # (four feature sets, 4 * zmax1 * mesh values), each pair block reduces
    # to ONE batched [cap, 4*Z*mesh] x [Z*mesh, cap] MXU matmul per cell —
    # the 25-point interpolation costs matmul flops instead of 25 serialized
    # transcendental passes.  (No LSE: k3 < 0 keeps every exponent <= 0;
    # fully-underflowed weights fall back to c6 = 0 like the w <= eps path.)
    m2 = mesh * mesh
    zm = zmax1 * mesh

    # per-own-atom feature block L [.., cap, 4, zmax1, mesh]
    cna_stack = jnp.stack(cna_plane, axis=-1)  # [.., cap, mesh]
    di_vec = cn_plane[..., None] - cna_stack
    # per-atom max-exponent scaling: exp factors cancel in the c6 = z/w and
    # dC6 ratios, so this is an exact LSE stabilization of the bilinear form
    arg_i = k3 * di_vec * di_vec
    e_i = jnp.exp(arg_i - jnp.max(arg_i, axis=-1, keepdims=True))
    eid = e_i * di_vec
    c6t = c6row_plane.reshape(c6row_plane.shape[:-1] + (zmax1, mesh, mesh))
    m01 = (c6t != 0.0).astype(dtype)
    l1 = jnp.einsum("...zpq,...p->...zq", c6t, e_i)
    l2 = jnp.einsum("...zpq,...p->...zq", c6t, eid)
    l3 = jnp.einsum("...zpq,...p->...zq", m01, e_i)
    l4 = jnp.einsum("...zpq,...p->...zq", m01, eid)
    l_feat = jnp.stack([l1, l2, l3, l4], axis=-3).reshape(
        cn_plane.shape + (4 * zm,)
    )  # [.., cap_i, 4*Z*mesh]

    def direct_kern(carry, own, cand, home):
        e, fx_a, fy_a, fz_a, decn = carry
        ok, r, dx, dy, dz = geom(own, cand)
        if home:
            ok &= upper

        # right features: R_j[z*mesh + q] = [z == zj] * e_j[q] (and * dj for
        # the j-side CN derivative)
        zj = cand["z"]  # [.., cap]
        cnab_j = jnp.stack(
            [cand[f"cna{q}"] for q in range(mesh)], axis=-1
        )  # [.., cap_j, mesh]
        dj_vec = cand["cn"][..., None] - cnab_j
        arg_j = k3 * dj_vec * dj_vec
        e_j = jnp.exp(arg_j - jnp.max(arg_j, axis=-1, keepdims=True))
        ziota = jax.lax.broadcasted_iota(INDEX_DTYPE, (1, 1, 1, 1, zmax1), 4)
        ohj = (zj[..., None] == ziota).astype(dtype)  # [.., cap_j, Z+1]
        r_feat = (ohj[..., :, None] * e_j[..., None, :]).reshape(
            zj.shape + (zm,)
        )  # [.., cap_j, Z*mesh]
        r_feat_dj = (ohj[..., :, None] * (e_j * dj_vec)[..., None, :]).reshape(
            zj.shape + (zm,)
        )

        lf = own["l_feat"].reshape(own["l_feat"].shape[:-1] + (4, zm))
        zacc = jnp.einsum("...if,...jf->...ij", lf[..., 0, :], r_feat)
        z_di = jnp.einsum("...if,...jf->...ij", lf[..., 1, :], r_feat)
        w = jnp.einsum("...if,...jf->...ij", lf[..., 2, :], r_feat)
        w_di = jnp.einsum("...if,...jf->...ij", lf[..., 3, :], r_feat)
        z_dj = jnp.einsum("...if,...jf->...ij", lf[..., 0, :], r_feat_dj)
        w_dj = jnp.einsum("...if,...jf->...ij", lf[..., 2, :], r_feat_dj)

        good = w > 1e-12
        w_safe = jnp.where(good, w, 1.0)
        c6 = jnp.where(good, zacc / w_safe, 0.0)
        dc6_dcni = jnp.where(good, 2.0 * k3 / w_safe * (z_di - c6 * w_di), 0.0)
        dc6_dcnj = jnp.where(good, 2.0 * k3 / w_safe * (z_dj - c6 * w_dj), 0.0)

        pair_ok = ok & (c6 >= 1e-12)
        rr = 3.0 * own["r4r2"][..., :, None] * cand["r4r2"][..., None, :]
        r0 = a1 * jnp.sqrt(rr) + a2
        r2_ = r * r
        r4 = r2_ * r2_
        r6 = r4 * r2_
        r8 = r4 * r4
        r0_2 = r0 * r0
        r0_6 = r0_2 * r0_2 * r0_2
        r0_8 = r0_2 * r0_2 * r0_2 * r0_2
        den6_inv = 1.0 / (r6 + r0_6)
        den8_inv = 1.0 / (r8 + r0_8)
        damp_sum = s6 * den6_inv + s8 * rr * den8_inv

        e_ij = -c6 * damp_sum
        dd6 = -6.0 * s6 * r4 * r * den6_inv * den6_inv
        dd8 = -8.0 * s8 * rr * r6 * r * den8_inv * den8_inv
        de_dr = -c6 * (dd6 + dd8)

        coef = jnp.where(pair_ok, de_dr / r, 0.0)
        cfx = coef * dx
        cfy = coef * dy
        cfz = coef * dz
        e = e + jnp.sum(jnp.where(pair_ok, e_ij, 0.0), axis=-1)
        fx_a = fx_a + jnp.sum(cfx, axis=-1)
        fy_a = fy_a + jnp.sum(cfy, axis=-1)
        fz_a = fz_a + jnp.sum(cfz, axis=-1)
        decn = decn + jnp.sum(jnp.where(pair_ok, -damp_sum * dc6_dcni, 0.0), axis=-1)
        deltas = (
            jnp.sum(-cfx, axis=-2),
            jnp.sum(-cfy, axis=-2),
            jnp.sum(-cfz, axis=-2),
            jnp.sum(jnp.where(pair_ok, -damp_sum * dc6_dcnj, 0.0), axis=-2),
        )
        return (e, fx_a, fy_a, fz_a, decn), deltas

    zeros = jnp.zeros((cz, cy, cx, cap), dtype)
    extra_ext2 = extra_ext + (("cn", cn_ext), ("r4r2", r4r2_ext)) + tuple(
        (f"cna{p}", cna_ext[p]) for p in range(mesh)
    )
    extra_own2 = extra_own + (
        ("cn", cn_plane), ("r4r2", r4r2_plane), ("l_feat", l_feat),
    )
    (e_pl, fx_pl, fy_pl, fz_pl, decn_pl), (dfx, dfy, dfz, ddecn) = grid_row_reduce_sym(
        grid, direct_kern, (zeros, zeros, zeros, zeros, zeros), 4,
        extra_ext_planes=extra_ext2, extra_own_planes=extra_own2,
    )
    fx_pl = fx_pl + dfx
    fy_pl = fy_pl + dfy
    fz_pl = fz_pl + dfz
    decn_pl = decn_pl + ddecn
    decn_ext = _extend_like(grid, decn_pl, 0.0)

    # ---- pass 3: CN chain-rule forces (symmetric) --------------------------
    def chain_kern(carry, own, cand, home):
        fx_a, fy_a, fz_a = carry
        ok, r, dx, dy, dz = geom(own, cand)
        if home:
            ok &= upper
        rc = own["rcov"][..., :, None] + cand["rcov"][..., None, :]
        rrq = rc / r
        f_cn = 1.0 / (1.0 + jnp.exp(-k1 * (rrq - 1.0)))
        dcn_dr = -f_cn * (1.0 - f_cn) * k1 * rrq / r
        de_chain = (own["decn"][..., :, None] + cand["decn"][..., None, :]) * dcn_dr
        coef = jnp.where(ok, de_chain / r, 0.0)
        cfx = coef * dx
        cfy = coef * dy
        cfz = coef * dz
        fx_a = fx_a + jnp.sum(cfx, axis=-1)
        fy_a = fy_a + jnp.sum(cfy, axis=-1)
        fz_a = fz_a + jnp.sum(cfz, axis=-1)
        deltas = (
            jnp.sum(-cfx, axis=-2),
            jnp.sum(-cfy, axis=-2),
            jnp.sum(-cfz, axis=-2),
        )
        return (fx_a, fy_a, fz_a), deltas

    extra_ext3 = extra_ext + (("decn", decn_ext),)
    extra_own3 = extra_own + (("decn", decn_pl),)
    (fx2, fy2, fz2), (dfx3, dfy3, dfz3) = grid_row_reduce_sym(
        grid, chain_kern, (fx_pl, fy_pl, fz_pl), 3,
        extra_ext_planes=extra_ext3, extra_own_planes=extra_own3,
    )
    fx2 = fx2 + dfx3
    fy2 = fy2 + dfy3
    fz2 = fz2 + dfz3
    return e_pl, fx2, fy2, fz2, cn_plane


def grid_dftd3(
    grid: AtomGrid,
    numbers,
    rcov,
    r4r2,
    c6ab,
    cn_ref_elem,
    cutoff: float,
    a1, a2, s8,
    s6=1.0, k1=16.0, k3=-4.0,
):
    """DFT-D3(BJ) energies/forces/CNs on the atom grid.

    ``cn_ref_elem`` is the [Zmax+1, mesh] element-structured CN reference
    table (see :func:`element_cn_ref`).  Returns
    ``(energy_total, forces [N,3], coord_num [N])`` in the grid's dtype.
    """
    dtype = grid.ext_px.dtype
    numbers = jnp.asarray(numbers, INDEX_DTYPE)
    n = numbers.shape[0]
    zmax1 = rcov.shape[0]
    mesh = cn_ref_elem.shape[1]

    # per-atom element data (cheap N-length gathers), scattered to planes
    rcov_a = rcov.astype(dtype)[numbers]
    r4r2_a = r4r2.astype(dtype)[numbers]
    cna_a = cn_ref_elem.astype(dtype)[numbers]  # [N, mesh]
    c6row_a = c6ab.astype(dtype).reshape(zmax1, zmax1, mesh * mesh)[numbers]  # [N, Z+1, m2]

    z_plane = scatter_to_grid(grid, numbers, fill=0)
    rcov_plane = scatter_to_grid(grid, rcov_a)
    r4r2_plane = scatter_to_grid(grid, r4r2_a)
    cna_plane = tuple(scatter_to_grid(grid, cna_a[:, p]) for p in range(mesh))
    # one row-scatter for the whole per-atom C6 row block (flat [N, Z+1 * m2])
    cz_, cy_, cx_ = grid.dims
    nslots = cz_ * cy_ * cx_ * grid.cap
    feat = c6row_a.reshape(n, zmax1 * mesh * mesh)
    buf = jnp.zeros((nslots + 1, feat.shape[1]), dtype=dtype)
    c6row_plane = buf.at[grid.flat_slot].set(feat)[:-1].reshape(
        cz_, cy_, cx_, grid.cap, feat.shape[1]
    )

    z_ext = _extend_like(grid, z_plane, 0)
    rcov_ext = _extend_like(grid, rcov_plane, 0.0)
    r4r2_ext = _extend_like(grid, r4r2_plane, 0.0)
    cna_ext = tuple(_extend_like(grid, p_, 0.0) for p_ in cna_plane)

    e_pl, fx_pl, fy_pl, fz_pl, cn_pl = _grid_d3_impl(
        grid,
        z_plane, z_ext,
        rcov_plane, rcov_ext,
        r4r2_plane, r4r2_ext,
        cna_plane, cna_ext,
        c6row_plane,
        jnp.asarray(cutoff, dtype), jnp.asarray(a1, dtype), jnp.asarray(a2, dtype),
        jnp.asarray(s6, dtype), jnp.asarray(s8, dtype), jnp.asarray(k1, dtype),
        jnp.asarray(k3, dtype),
        grid.dims, grid.radius, grid.cap, int(mesh), int(zmax1),
    )
    energy = jnp.sum(e_pl)  # pairs counted once in the symmetric sweep
    forces = jnp.stack(
        [gather_from_grid(grid, fx_pl), gather_from_grid(grid, fy_pl),
         gather_from_grid(grid, fz_pl)],
        axis=-1,
    )
    coord_num = gather_from_grid(grid, cn_pl)
    return energy, forces, coord_num
