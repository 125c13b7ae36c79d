# SPDX-License-Identifier: Apache-2.0
"""Spatial domain decomposition of the halo-grid sweep over a device mesh.

At-scale TPU-native scaling for the real-space pipeline: the cell grid's z
axis is sharded across devices (one z-slab of cells per chip); each device
sweeps its own slab and the inter-slab pair interactions ride a ring of
``lax.ppermute`` halo exchanges over ICI — the collective-based equivalent
of the reference's single-GPU cell-list sweep (cell_list.py:372-556), which
has no multi-device story at all.

Design (z-ring):

1. The grid is built replicated (one argsort; cheap relative to the sweep)
   and its *interior* planes enter ``shard_map`` with ``P("z")`` on the
   leading cell axis: each device holds ``[cz/D, cy, cx, cap]``.
2. Each device ppermute-shifts its boundary cell rows to the neighbors —
   one exchange up, one down, of ``rz`` cell rows each — and concatenates
   them as z halos.  The ring is periodic, which *is* the z-periodic
   boundary: the wrap-around edge applies the lattice shift to the ghost
   positions (exactly like the single-device halo build).
3. y/x periodicity stays local (wrap pads inside the slab).
4. The sweep walks the same half-space offsets as the single-device
   symmetric engine; j-side contributions that land in a z halo are
   ppermute'd back to their owner and added — the collective form of the
   halo fold (grid.fold_halo).

Non-periodic z is supported by masking the ring edge instead of shifting
it.  Requires cz % ndev == 0 and cz/D >= rz.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nvalchemiops_tpu.grid import (
    AtomGrid,
    scatter_to_grid,
    gather_from_grid,
    gather_rows_from_grid,
    _interior,
    row_home_mask,
    DISPLACE,
)
from nvalchemiops_tpu.mathops.math import apply_mat3, erfc_approx

__all__ = [
    "make_z_mesh",
    "domain_coulomb_energy_forces",
    "domain_dftd3_cn",
    "domain_dftd3",
    "domain_dftd3_coulomb",
    "domain_pme_reciprocal",
]


def make_z_mesh(devices=None) -> Mesh:
    """1-D device mesh over the grid's z axis."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), ("z",))


def _halo_exchange(local, rz: int, axis: str, cell_z_shift=None,
                   shift_field: int | None = None, periodic: bool = True):
    """Concatenate z halos fetched from ring neighbors.

    ``local``: [lz, cy, cx, cap(, F)].  Returns [lz + 2rz, ...].  When
    ``cell_z_shift`` is given (tuple of per-plane shifts aligned with the
    last-dim layout of ``local``), the wrap-around edges add the lattice
    shift to the ghost values (used for position planes); other planes pass
    ``None``.  Non-periodic z masks the ring-wrapped edges to parked /
    zero values instead via ``periodic=False``.
    """
    ndev = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    # receive from below (my low-z halo = top rows of device idx-1)
    perm_up = [(i, (i + 1) % ndev) for i in range(ndev)]    # send up
    perm_dn = [(i, (i - 1) % ndev) for i in range(ndev)]    # send down
    top = local[-rz:]
    bot = local[:rz]
    halo_lo = jax.lax.ppermute(top, axis, perm_up)          # from idx-1
    halo_hi = jax.lax.ppermute(bot, axis, perm_dn)          # from idx+1
    if cell_z_shift is not None:
        # device 0's low halo wrapped around the ring: shift by -Lz; the
        # top device's high halo: +Lz
        lo_w = (idx == 0).astype(local.dtype)
        hi_w = (idx == ndev - 1).astype(local.dtype)
        halo_lo = halo_lo - lo_w * cell_z_shift
        halo_hi = halo_hi + hi_w * cell_z_shift
    if not periodic:
        lo_bad = idx == 0
        hi_bad = idx == ndev - 1
        park = jnp.asarray(DISPLACE if cell_z_shift is not None else 0.0,
                           local.dtype)
        halo_lo = jnp.where(lo_bad, park, halo_lo)
        halo_hi = jnp.where(hi_bad, park, halo_hi)
    return jnp.concatenate([halo_lo, local, halo_hi], axis=0)


def _wrap_pad_yx(ext, ry: int, rx: int, pbc_y: bool, pbc_x: bool, park,
                 shift_y=None, shift_x=None):
    """Periodic (or parked) y/x halos, local to the slab.

    Position planes pass ``shift_y``/``shift_x`` (the lattice-vector
    component for this coordinate): wrapped ghost values get the image
    shift applied, exactly like the single-device halo build.
    """
    def pad_axis(a, axis, r, is_pbc, shift):
        if r == 0:
            return a
        cfg = [(0, 0)] * a.ndim
        cfg[axis] = (r, r)
        if not is_pbc:
            return jnp.pad(a, cfg, mode="constant", constant_values=park)
        a = jnp.pad(a, cfg, mode="wrap")
        if shift is not None:
            n_core = a.shape[axis] - 2 * r
            lo = [slice(None)] * a.ndim
            hi = [slice(None)] * a.ndim
            lo[axis] = slice(0, r)
            hi[axis] = slice(r + n_core, None)
            a = a.at[tuple(lo)].add(-shift)
            a = a.at[tuple(hi)].add(shift)
        return a
    ext = pad_axis(ext, 1, ry, pbc_y, shift_y)
    ext = pad_axis(ext, 2, rx, pbc_x, shift_x)
    return ext


def _fold_yx(acc, ry: int, rx: int, cy: int, cx: int):
    """Fold local y/x halo accumulator rows back onto the interior."""
    a = acc
    if ry:
        core = a[:, ry:ry + cy]
        core = core.at[:, :ry].add(a[:, ry + cy:ry + cy + ry])
        core = core.at[:, cy - ry:].add(a[:, 0:ry])
        a = core
    if rx:
        core = a[:, :, rx:rx + cx]
        core = core.at[:, :, :rx].add(a[:, :, rx + cx:rx + cx + rx])
        core = core.at[:, :, cx - rx:].add(a[:, :, 0:rx])
        a = core
    return a


def _fold_z_ring(acc_ext, rz: int, axis: str):
    """Return j-side z-halo rows to their owners over the ring and add."""
    ndev = jax.lax.axis_size(axis)
    perm_up = [(i, (i + 1) % ndev) for i in range(ndev)]
    perm_dn = [(i, (i - 1) % ndev) for i in range(ndev)]
    lo = acc_ext[:rz]                       # deltas for idx-1's top rows
    hi = acc_ext[acc_ext.shape[0] - rz:]    # deltas for idx+1's bottom rows
    core = acc_ext[rz:acc_ext.shape[0] - rz]
    from_above = jax.lax.ppermute(lo, axis, perm_dn)  # my top rows' deltas
    from_below = jax.lax.ppermute(hi, axis, perm_up)  # my bottom rows'
    core = core.at[-rz:].add(from_above)
    core = core.at[:rz].add(from_below)
    return core


def _run_domain_sym(mesh: Mesh, kern, planes: dict, init, num_j: int,
                    cell, dims, radius, cap, pbc_zyx):
    """Run a ``grid_row_reduce_sym``-contract kernel on z-slab shards.

    ``planes``: dict name -> *interior* plane [cz, cy, cx, cap(, F)], must
    include px/py/pz (position planes get lattice shifts on their wrapped
    halos).  ``kern(carry, own, cand, home) -> (carry, j_deltas)`` with
    ``num_j`` window-shaped j-side delta arrays — the same bodies the
    single-device engine uses (e.g. ``grid_d3.make_d3_row_kernels``).
    Returns ``(carry, folded_j_tuple)`` as global ``P("z")``-sharded
    planes; inter-slab traffic is ppermute halo exchange + the j-side
    ring fold.
    """
    cz, cy, cx = dims
    rz, ry, rx = radius
    pbc_z, pbc_y, pbc_x = pbc_zyx
    comp_of = {"px": 0, "py": 1, "pz": 2}
    names = sorted(planes)

    def slab(init_local, *vals):
        local = dict(zip(names, vals))
        lz = local["px"].shape[0]
        ext = {}
        for name, p in local.items():
            if name in comp_of:
                comp = comp_of[name]
                e = _halo_exchange(p, rz, "z", cell_z_shift=cell[2, comp],
                                   periodic=pbc_z)
                ext[name] = _wrap_pad_yx(e, ry, rx, pbc_y, pbc_x, DISPLACE,
                                         shift_y=cell[1, comp],
                                         shift_x=cell[0, comp])
            else:
                ext[name] = _wrap_pad_yx(
                    _halo_exchange(p, rz, "z", periodic=pbc_z),
                    ry, rx, pbc_y, pbc_x, 0.0)

        eacc = [jnp.zeros((lz + 2 * rz, cy + 2 * ry, cx + 2 * rx, cap),
                          local["px"].dtype) for _ in range(num_j)]

        def window(plane, z0, y0, chunks):
            return jnp.concatenate(
                [plane[z0:z0 + lz, y0:y0 + cy, c:c + cx] for c in chunks],
                axis=3)

        def run(carry, z0, y0, chunks, home):
            cand = {k: window(p, z0, y0, chunks) for k, p in ext.items()}
            carry, deltas = kern(carry, local, cand, home)
            for k, delta in enumerate(deltas):
                d = delta.reshape(lz, cy, cx, len(chunks), cap)
                ea = eacc[k]
                for ci, c in enumerate(chunks):
                    ea = ea.at[z0:z0 + lz, y0:y0 + cy, c:c + cx].add(
                        d[..., ci, :])
                eacc[k] = ea
            return carry

        carry = run(init_local, rz, ry, list(range(rx, 2 * rx + 1)), True)
        full_chunks = list(range(2 * rx + 1))
        for dz in range(-rz, rz + 1):
            for dy in range(-ry, ry + 1):
                if dz > 0 or (dz == 0 and dy > 0):
                    carry = run(carry, dz + rz, dy + ry, full_chunks, False)

        folded = tuple(
            _fold_z_ring(_fold_yx(ea, ry, rx, cy, cx), rz, "z")
            for ea in eacc)
        return carry, folded

    zspec = jax.tree.map(lambda _: P("z"), planes)
    init_spec = jax.tree.map(lambda _: P("z"), init)
    carry, folded = shard_map(
        slab, mesh=mesh,
        in_specs=(init_spec,) + tuple(P("z") for _ in names),
        out_specs=(init_spec, tuple(P("z") for _ in range(num_j))),
    )(init, *[planes[n] for n in names])
    return carry, folded


@partial(jax.jit, static_argnames=("mesh", "dims", "radius", "cap", "cutoff",
                                   "a1", "a2", "s6", "s8", "k1", "k3",
                                   "mesh_pts", "zmax1", "pbc_zyx",
                                   "calpha", "ccutoff"))
def _domain_d3_impl(mesh: Mesh, grid: AtomGrid, z_plane, rcov_plane,
                    r4r2_plane, cna_a, mask_a, c6p_a, cell,
                    cutoff: float, a1: float, a2: float, s6: float,
                    s8: float, k1: float, k3: float,
                    dims, radius, cap, mesh_pts: int, zmax1: int, pbc_zyx,
                    q_plane=None, calpha=None, ccutoff=None):
    """Full 3-pass DFT-D3 with the grid's z axis sharded over the mesh.

    Reuses the *exact* single-device pass bodies
    (grid_d3.make_d3_row_kernels), so the domain decomposition is
    numerically the single-device XLA engine modulo reduction order; the
    per-atom feature build between passes runs replicated (O(N), cheap
    next to the sweeps).
    """
    from nvalchemiops_tpu.grid import DISPLACE as _DISP
    from nvalchemiops_tpu.grid import DISPLACE_SPACING as _SPACING
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
        make_d3_row_kernels, _d3_feature_planes,
    )

    dtype = grid.ext_px.dtype
    cz, cy, cx = dims
    rz, ry, rx = radius
    cutoff_sq = jnp.asarray(cutoff, dtype) ** 2
    upper = row_home_mask(cap, rx)
    zm = zmax1 * mesh_pts
    cn_kern, direct_kern, chain_kern = make_d3_row_kernels(
        cutoff_sq, a1, a2, s6, s8, k1, k3, zm, upper)

    # padding atoms (numbers == 0) parked like the build's empty slots
    iota = jnp.arange(cz * cy * cx * cap, dtype=dtype).reshape(
        cz, cy, cx, cap)
    px_i = _interior(grid, grid.ext_px) + jnp.where(
        z_plane == 0, _DISP + iota * _SPACING, 0.0)
    pos = dict(px=px_i, py=_interior(grid, grid.ext_py),
               pz=_interior(grid, grid.ext_pz))

    zeros = jnp.zeros((cz, cy, cx, cap), dtype)

    # pass 1: coordination numbers
    cn_carry, (cn_fold,) = _run_domain_sym(
        mesh, cn_kern, dict(pos, rcov=rcov_plane), zeros, 1,
        cell, dims, radius, cap, pbc_zyx)
    cn_plane = cn_carry + cn_fold

    # per-atom features (replicated)
    cn_a = gather_from_grid(grid, cn_plane)
    lf_plane, rf_plane, rfdc_plane, w_a, wd_a = _d3_feature_planes(
        grid, z_plane, cn_a, cna_a, mask_a, c6p_a, k3, dtype, dims, cap)
    w_plane = scatter_to_grid(grid, w_a)
    si_plane = jnp.sqrt(r4r2_plane * 1.7320508075688772)

    # pass 2: energy + direct forces + dE/dCN (compensated l1c/rfdc
    # derivative features — see _d3_atom_features); optionally fused with
    # the real-space Coulomb body on the same candidate windows
    pass2_kern = direct_kern
    planes2 = dict(pos, si=si_plane, w=w_plane, lf=lf_plane,
                   rf=rf_plane, rfdc=rfdc_plane)
    init2 = (zeros, zeros, zeros, zeros, zeros)
    num_j2 = 4
    with_coulomb = ccutoff is not None
    if with_coulomb:
        from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
            fuse_direct_kernels, make_coulomb_row_kernel,
        )

        pass2_kern = fuse_direct_kernels(
            direct_kern,
            make_coulomb_row_kernel(float(ccutoff) ** 2, float(calpha),
                                    upper))
        planes2["q"] = q_plane
        init2 = init2 + (zeros, zeros, zeros, zeros)
        num_j2 = 8
    carry, deltas2 = _run_domain_sym(
        mesh, pass2_kern, planes2, init2, num_j2,
        cell, dims, radius, cap, pbc_zyx)
    dfx, dfy, dfz, ddecn = deltas2[:4]
    e_pl, fx_pl, fy_pl, fz_pl, decn_pl = carry[:5]
    coul = None
    if with_coulomb:
        dec, dfcx, dfcy, dfcz = deltas2[4:]
        ec, fcx, fcy, fcz = carry[-4:]
        coul = (ec + dec, fcx + dfcx, fcy + dfcy, fcz + dfcz)
    fx_pl = fx_pl + dfx
    fy_pl = fy_pl + dfy
    fz_pl = fz_pl + dfz
    decn_pl = decn_pl + ddecn

    # pass 3: CN chain-rule forces
    (fx2, fy2, fz2), (dfx3, dfy3, dfz3) = _run_domain_sym(
        mesh, chain_kern, dict(pos, rcov=rcov_plane, decn=decn_pl),
        (fx_pl, fy_pl, fz_pl), 3,
        cell, dims, radius, cap, pbc_zyx)
    out = (e_pl, fx2 + dfx3, fy2 + dfy3, fz2 + dfz3, cn_plane)
    return out + coul if with_coulomb else out


def domain_dftd3(mesh: Mesh, grid: AtomGrid, numbers, rcov, r4r2, c6ab,
                 cn_ref_elem, cutoff, a1, a2, s8, cell,
                 s6=1.0, k1=16.0, k3=-4.0, pbc=(True, True, True)):
    """DFT-D3(BJ) energies/forces/CNs with the z axis sharded over a mesh.

    Same contract as :func:`...grid_d3.grid_dftd3` on one device (plus the
    explicit ``cell`` for halo image shifts); see
    :func:`domain_coulomb_energy_forces` for the slab constraints.
    """
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
        element_c6_mask,
    )
    from nvalchemiops_tpu.types import INDEX_DTYPE

    cz = grid.dims[0]
    ndev = mesh.devices.size
    if cz % ndev or cz // ndev < grid.radius[0]:
        raise ValueError(
            f"cz={cz} must split into >={grid.radius[0]}-thick slabs "
            f"across {ndev} devices")

    dtype = grid.ext_px.dtype
    numbers = jnp.asarray(numbers, INDEX_DTYPE)
    zmax1 = rcov.shape[0]
    mesh_pts = cn_ref_elem.shape[1]
    mask_elem = element_c6_mask(c6ab)
    rcov_a = rcov.astype(dtype)[numbers]
    r4r2_a = r4r2.astype(dtype)[numbers]
    cna_a = cn_ref_elem.astype(dtype)[numbers]
    mask_a = mask_elem.astype(dtype)[numbers]
    c6p = jnp.transpose(c6ab.astype(dtype), (0, 2, 1, 3)).reshape(
        zmax1, mesh_pts, zmax1 * mesh_pts)
    c6p_a = c6p[numbers]

    z_plane = scatter_to_grid(grid, numbers, fill=0)
    rcov_plane = scatter_to_grid(grid, rcov_a)
    r4r2_plane = scatter_to_grid(grid, r4r2_a)
    cellj = jnp.asarray(cell, dtype).reshape(3, 3)

    e_pl, fx, fy, fz, cn_pl = _domain_d3_impl(
        mesh, grid, z_plane, rcov_plane, r4r2_plane, cna_a, mask_a, c6p_a,
        cellj, float(cutoff), float(a1), float(a2), float(s6), float(s8),
        float(k1), float(k3), grid.dims, grid.radius, grid.cap,
        int(mesh_pts), int(zmax1),
        (bool(pbc[2]), bool(pbc[1]), bool(pbc[0])))
    energy = jnp.sum(e_pl)
    f1, f2, f3, coord_num = gather_rows_from_grid(grid, (fx, fy, fz, cn_pl))
    return energy, jnp.stack([f1, f2, f3], axis=-1), coord_num


def domain_dftd3_coulomb(mesh: Mesh, grid: AtomGrid, numbers, charges,
                         rcov, r4r2, c6ab, cn_ref_elem, cutoff,
                         a1, a2, s8, cell, coulomb_cutoff=None, alpha=0.0,
                         s6=1.0, k1=16.0, k3=-4.0,
                         pbc=(True, True, True)):
    """Fused domain-decomposed D3 + real-space Coulomb (one sweep set).

    The multi-chip counterpart of
    :func:`...grid_d3.grid_dftd3_coulomb(engine="xla")`: the Coulomb pair
    body rides the D3 direct pass inside the same shard_map program, so
    the whole real-space force field pays ONE set of z-ring halo
    exchanges and one pass-2 traversal.  Returns
    ``(e_d3_total, f_d3 [N,3], coord_num [N], e_coulomb [N],
    f_coulomb [N,3])``.
    """
    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
        element_c6_mask,
    )
    from nvalchemiops_tpu.types import INDEX_DTYPE

    cz = grid.dims[0]
    ndev = mesh.devices.size
    if cz % ndev or cz // ndev < grid.radius[0]:
        raise ValueError(
            f"cz={cz} must split into >={grid.radius[0]}-thick slabs "
            f"across {ndev} devices")
    if coulomb_cutoff is None:
        coulomb_cutoff = cutoff

    dtype = grid.ext_px.dtype
    numbers = jnp.asarray(numbers, INDEX_DTYPE)
    zmax1 = rcov.shape[0]
    mesh_pts = cn_ref_elem.shape[1]
    mask_elem = element_c6_mask(c6ab)
    rcov_a = rcov.astype(dtype)[numbers]
    r4r2_a = r4r2.astype(dtype)[numbers]
    cna_a = cn_ref_elem.astype(dtype)[numbers]
    mask_a = mask_elem.astype(dtype)[numbers]
    c6p = jnp.transpose(c6ab.astype(dtype), (0, 2, 1, 3)).reshape(
        zmax1, mesh_pts, zmax1 * mesh_pts)
    c6p_a = c6p[numbers]

    z_plane = scatter_to_grid(grid, numbers, fill=0)
    rcov_plane = scatter_to_grid(grid, rcov_a)
    r4r2_plane = scatter_to_grid(grid, r4r2_a)
    q_plane = scatter_to_grid(grid, jnp.asarray(charges, dtype))
    cellj = jnp.asarray(cell, dtype).reshape(3, 3)

    (e_pl, fx, fy, fz, cn_pl, ec_pl, fcx, fcy, fcz) = _domain_d3_impl(
        mesh, grid, z_plane, rcov_plane, r4r2_plane, cna_a, mask_a, c6p_a,
        cellj, float(cutoff), float(a1), float(a2), float(s6), float(s8),
        float(k1), float(k3), grid.dims, grid.radius, grid.cap,
        int(mesh_pts), int(zmax1),
        (bool(pbc[2]), bool(pbc[1]), bool(pbc[0])),
        q_plane=q_plane, calpha=float(alpha),
        ccutoff=float(coulomb_cutoff))
    energy = jnp.sum(e_pl)
    f1, f2, f3, coord_num, e_c, fc1, fc2, fc3 = gather_rows_from_grid(
        grid, (fx, fy, fz, cn_pl, ec_pl, fcx, fcy, fcz))
    return (energy, jnp.stack([f1, f2, f3], axis=-1), coord_num,
            e_c, jnp.stack([fc1, fc2, fc3], axis=-1))


@partial(jax.jit, static_argnames=("mesh", "dims", "radius", "cap", "cutoff",
                                   "alpha", "pbc_zyx"))
def _domain_coulomb_impl(mesh: Mesh, grid: AtomGrid, q_plane, cell,
                         cutoff: float, alpha: float, dims, radius, cap,
                         pbc_zyx):
    """Sharded symmetric Coulomb sweep (z-slab domain decomposition)."""
    dtype = grid.ext_px.dtype
    cz, cy, cx = dims
    rz, ry, rx = radius
    cutoff_sq = float(cutoff) ** 2
    alpha_t = float(alpha)
    pbc_z, pbc_y, pbc_x = pbc_zyx
    two_over_sqrt_pi = 1.1283791670955126
    upper = row_home_mask(cap, rx)
    # lattice z shift per position component (cell row 2)

    px_i = _interior(grid, grid.ext_px)
    py_i = _interior(grid, grid.ext_py)
    pz_i = _interior(grid, grid.ext_pz)

    def slab(px, py, pz, q):
        # px/py/pz/q: [cz/D, cy, cx, cap] local slabs
        exts = []
        for comp, p in enumerate((px, py, pz)):
            e = _halo_exchange(p, rz, "z", cell_z_shift=cell[2, comp],
                               periodic=pbc_z)
            exts.append(_wrap_pad_yx(e, ry, rx, pbc_y, pbc_x, DISPLACE,
                                     shift_y=cell[1, comp],
                                     shift_x=cell[0, comp]))
        qe = _wrap_pad_yx(_halo_exchange(q, rz, "z", periodic=pbc_z),
                          ry, rx, pbc_y, pbc_x, 0.0)
        epx, epy, epz = exts
        lz = px.shape[0]

        own = dict(px=px, py=py, pz=pz, q=q)
        acc = [jnp.zeros_like(q) for _ in range(4)]
        eacc = [jnp.zeros_like(qe) for _ in range(4)]

        def window(plane, z0, y0, chunks):
            return jnp.concatenate(
                [plane[z0:z0 + lz, y0:y0 + cy, c:c + cx] for c in chunks],
                axis=3)

        def run(z0, y0, chunks, home):
            cand = {k: window(p, z0, y0, chunks)
                    for k, p in dict(px=epx, py=epy, pz=epz, q=qe).items()}
            # pair block [.., cap, W]
            dxb = cand["px"][..., None, :] - own["px"][..., :, None]
            dyb = cand["py"][..., None, :] - own["py"][..., :, None]
            dzb = cand["pz"][..., None, :] - own["pz"][..., :, None]
            d2 = dxb * dxb + dyb * dyb + dzb * dzb
            ok = (d2 < cutoff_sq) & (d2 > 1e-20)
            if home:
                ok &= upper
            inv_r = jax.lax.rsqrt(jnp.where(ok, d2, 1.0))
            qq = own["q"][..., :, None] * cand["q"][..., None, :]
            if alpha_t > 0:
                r = jnp.where(ok, d2, 1.0) * inv_r
                ar = alpha_t * r
                erfc_ar = erfc_approx(ar)
                phi = erfc_ar * inv_r
                mag = (erfc_ar * inv_r
                       + two_over_sqrt_pi * alpha_t * jnp.exp(-ar * ar)
                       ) * inv_r * inv_r
            else:
                phi = inv_r
                mag = inv_r * inv_r * inv_r
            e_pair = jnp.where(ok, 0.5 * qq * phi, 0.0)
            coef = jnp.where(ok, qq * mag, 0.0)
            cfx = coef * dxb
            cfy = coef * dyb
            cfz = coef * dzb
            deltas = []
            for k, blk in enumerate((e_pair, cfx, cfy, cfz)):
                sgn = 1.0 if k == 0 else -1.0
                acc[k] = acc[k] + sgn * jnp.sum(blk, axis=-1)
                d = jnp.sum(blk, axis=-2).reshape(lz, cy, cx, len(chunks), cap)
                ea = eacc[k]
                for ci, c in enumerate(chunks):
                    ea = ea.at[z0:z0 + lz, y0:y0 + cy, c:c + cx].add(
                        d[..., ci, :])
                eacc[k] = ea

        run(rz, ry, list(range(rx, 2 * rx + 1)), True)
        full_chunks = list(range(2 * rx + 1))
        for dz in range(-rz, rz + 1):
            for dy in range(-ry, ry + 1):
                if dz > 0 or (dz == 0 and dy > 0):
                    run(dz + rz, dy + ry, full_chunks, False)

        outs = []
        for k in range(4):
            folded = _fold_yx(eacc[k], ry, rx, cy, cx)
            folded = _fold_z_ring(folded, rz, "z")
            outs.append(acc[k] + folded)
        return tuple(outs)

    e, fx, fy, fz = shard_map(
        slab, mesh=mesh,
        in_specs=(P("z"), P("z"), P("z"), P("z")),
        out_specs=(P("z"), P("z"), P("z"), P("z")),
    )(px_i, py_i, pz_i, q_plane)
    return e, fx, fy, fz


def domain_coulomb_energy_forces(mesh: Mesh, grid: AtomGrid, charges, cell,
                                 cutoff, alpha=0.0, pbc=(True, True, True)):
    """(Damped-)Coulomb energies/forces with the z axis sharded over a mesh.

    Same contract as :func:`nvalchemiops_tpu.grid.grid_coulomb_energy_forces`
    run on one device; the cell-grid z axis (``grid.dims[0]``) must divide
    by the mesh size with slabs at least ``radius[0]`` cells thick.
    z-periodicity comes from the ppermute ring.  ``pbc`` is (z, y, x).
    """
    cz = grid.dims[0]
    ndev = mesh.devices.size
    if cz % ndev or cz // ndev < grid.radius[0]:
        raise ValueError(
            f"cz={cz} must split into >={grid.radius[0]}-thick slabs "
            f"across {ndev} devices")
    q_plane = scatter_to_grid(grid, jnp.asarray(charges))
    cellj = jnp.asarray(cell, grid.ext_px.dtype).reshape(3, 3)
    e, fx, fy, fz = _domain_coulomb_impl(
        mesh, grid, q_plane, cellj, float(cutoff), float(alpha),
        grid.dims, grid.radius, grid.cap,
        (bool(pbc[2]), bool(pbc[1]), bool(pbc[0])),
    )
    energies, f1, f2, f3 = gather_rows_from_grid(grid, (e, fx, fy, fz))
    return energies, jnp.stack([f1, f2, f3], axis=-1)


@partial(jax.jit, static_argnames=("mesh", "dims", "radius", "cap", "cutoff",
                                   "k1", "pbc_zyx"))
def _domain_cn_impl(mesh: Mesh, grid: AtomGrid, rcov_plane, cell,
                    cutoff: float, k1: float, dims, radius, cap, pbc_zyx):
    dtype = grid.ext_px.dtype
    cz, cy, cx = dims
    rz, ry, rx = radius
    cutoff_sq = float(cutoff) ** 2
    pbc_z, pbc_y, pbc_x = pbc_zyx
    upper = row_home_mask(cap, rx)

    px_i = _interior(grid, grid.ext_px)
    py_i = _interior(grid, grid.ext_py)
    pz_i = _interior(grid, grid.ext_pz)

    def slab(px, py, pz, rcov):
        exts = []
        for comp, p in enumerate((px, py, pz)):
            e = _halo_exchange(p, rz, "z", cell_z_shift=cell[2, comp],
                               periodic=pbc_z)
            exts.append(_wrap_pad_yx(e, ry, rx, pbc_y, pbc_x, DISPLACE,
                                     shift_y=cell[1, comp],
                                     shift_x=cell[0, comp]))
        rce = _wrap_pad_yx(_halo_exchange(rcov, rz, "z", periodic=pbc_z),
                           ry, rx, pbc_y, pbc_x, 0.0)
        epx, epy, epz = exts
        lz = px.shape[0]
        acc = jnp.zeros_like(rcov)
        eacc = jnp.zeros_like(rce)

        def window(plane, z0, y0, chunks):
            return jnp.concatenate(
                [plane[z0:z0 + lz, y0:y0 + cy, c:c + cx] for c in chunks],
                axis=3)

        def run(acc, eacc, z0, y0, chunks, home):
            cpx = window(epx, z0, y0, chunks)
            cpy = window(epy, z0, y0, chunks)
            cpz = window(epz, z0, y0, chunks)
            crc = window(rce, z0, y0, chunks)
            dxb = cpx[..., None, :] - px[..., :, None]
            dyb = cpy[..., None, :] - py[..., :, None]
            dzb = cpz[..., None, :] - pz[..., :, None]
            d2 = dxb * dxb + dyb * dyb + dzb * dzb
            ok = (d2 < cutoff_sq) & (d2 > 1e-20)
            if home:
                ok &= upper
            inv_r = jax.lax.rsqrt(jnp.where(ok, d2, 1.0))
            rc = rcov[..., :, None] + crc[..., None, :]
            f = jnp.where(ok, 1.0 / (1.0 + jnp.exp(-k1 * (rc * inv_r - 1.0))),
                          0.0)
            acc = acc + jnp.sum(f, axis=-1)
            d = jnp.sum(f, axis=-2).reshape(lz, cy, cx, len(chunks), cap)
            for ci, c in enumerate(chunks):
                eacc = eacc.at[z0:z0 + lz, y0:y0 + cy, c:c + cx].add(
                    d[..., ci, :])
            return acc, eacc

        acc, eacc = run(acc, eacc, rz, ry, list(range(rx, 2 * rx + 1)), True)
        full_chunks = list(range(2 * rx + 1))
        for dz in range(-rz, rz + 1):
            for dy in range(-ry, ry + 1):
                if dz > 0 or (dz == 0 and dy > 0):
                    acc, eacc = run(acc, eacc, dz + rz, dy + ry,
                                    full_chunks, False)

        folded = _fold_yx(eacc, ry, rx, cy, cx)
        folded = _fold_z_ring(folded, rz, "z")
        return acc + folded

    cn = shard_map(
        slab, mesh=mesh,
        in_specs=(P("z"), P("z"), P("z"), P("z")),
        out_specs=P("z"),
    )(px_i, py_i, pz_i, rcov_plane)
    return cn


def domain_dftd3_cn(mesh: Mesh, grid: AtomGrid, rcov_per_atom, cell,
                    cutoff, k1=16.0, pbc=(True, True, True)):
    """DFT-D3 coordination numbers with the grid's z axis device-sharded."""
    cz = grid.dims[0]
    ndev = mesh.devices.size
    if cz % ndev or cz // ndev < grid.radius[0]:
        raise ValueError(
            f"cz={cz} must split into >={grid.radius[0]}-thick slabs "
            f"across {ndev} devices")
    rcov_plane = scatter_to_grid(grid, jnp.asarray(rcov_per_atom))
    cellj = jnp.asarray(cell, grid.ext_px.dtype).reshape(3, 3)
    cn = _domain_cn_impl(mesh, grid, rcov_plane, cellj, float(cutoff),
                         float(k1), grid.dims, grid.radius, grid.cap,
                         (bool(pbc[2]), bool(pbc[1]), bool(pbc[0])))
    return gather_from_grid(grid, cn)


# ---------------------------------------------------------------------------
# Domain-decomposed PME (GSPMD: annotate shardings, XLA inserts collectives)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("mesh", "mesh_dims", "order", "cap",
                                   "compute_forces"))
def _domain_pme_impl(mesh: Mesh, positions, charges, cell, alpha,
                     mesh_dims, order: int, cap: int, compute_forces: bool):
    """Tile-sharded PME reciprocal space.

    Unlike the hand-rolled slab sweeps above, PME shards best by *pure
    annotation*: the windowed spread/gather are batched per-tile
    contractions (embarrassingly parallel over the tile axis), the parity
    fold is a cheap reduction, and the 3-D FFT of the whole mesh costs
    ~0.3 ms — so we constrain the tile-batched arrays to ``P("z")`` and
    let XLA's SPMD partitioner place the all-gathers/reduce-scatters on
    ICI (the scaling-book recipe: pick a mesh, annotate, let the compiler
    insert collectives).
    """
    from jax.sharding import NamedSharding
    from nvalchemiops_tpu import spline_windowed as sw

    shard_tiles = NamedSharding(mesh, P("z"))

    tiles = sw.build_mesh_tiles(positions, cell, mesh_dims, order, cap,
                                need_grad=compute_forces)
    tiles = jax.tree.map(
        lambda a: (jax.lax.with_sharding_constraint(a, shard_tiles)
                   if a.ndim >= 2 else a),
        tiles,
    )
    # reuse the single-device pipeline on the constrained tiles: the
    # spread/gather einsums batch over the sharded tile axis
    dtype = positions.dtype
    q = charges
    mesh_arr = sw.windowed_spread(tiles, q)
    mesh_fft = jnp.fft.rfftn(mesh_arr, norm="backward")
    from nvalchemiops_tpu.interactions.electrostatics.k_vectors import (
        generate_k_vectors_pme,
    )
    from nvalchemiops_tpu.interactions.electrostatics.pme import (
        pme_green_structure_factor,
    )
    _, k_squared = generate_k_vectors_pme(cell, mesh_dims)
    green, sf_sq = pme_green_structure_factor(
        k_squared, mesh_dims, alpha, cell, order)
    potential_mesh = jnp.fft.irfftn(
        mesh_fft / sf_sq * green, s=mesh_dims, norm="forward").astype(dtype)

    if compute_forces:
        raw, grad_frac = sw.windowed_gather(tiles, potential_mesh,
                                            with_gradient=True)
    else:
        raw = sw.windowed_gather(tiles, potential_mesh)
        grad_frac = None

    alpha_t = jnp.asarray(alpha, dtype).reshape(())
    volume = jnp.abs(jnp.linalg.det(jnp.asarray(cell, dtype).reshape(3, 3)))
    q_total = jnp.sum(q)
    energies = (q * raw
                - (alpha_t / jnp.sqrt(jnp.pi)) * q * q
                - (jnp.pi / (2.0 * alpha_t * alpha_t * volume)) * q * q_total)
    if not compute_forces:
        return energies, None
    # identical to the single-device windowed path: rotate the fractional
    # gradient through cell^-T, factor 2 for the spread-side symmetry,
    # uniform net-force removal (standard SPME)
    forces = 2.0 * apply_mat3(-q[:, None] * grad_frac, tiles.inv.T)
    forces = forces - jnp.mean(forces, axis=0, keepdims=True)
    return energies, forces


def domain_pme_reciprocal(mesh: Mesh, positions, charges, cell, alpha,
                          mesh_dims, order: int = 4,
                          tile_capacity: int | None = None,
                          compute_forces: bool = False):
    """PME reciprocal space with the mesh-tile axis sharded over devices.

    Same contract as the single-device
    :func:`...pme.pme_reciprocal_space` windowed path (per-atom energies
    incl. self/background corrections; optional spline-derivative forces
    with uniform net-force removal).  The leading tile axis must divide
    by the device count.
    """
    from nvalchemiops_tpu import spline_windowed as sw

    if not sw.windowed_applicable(mesh_dims, order):
        raise ValueError("domain PME requires the windowed configuration "
                         f"(mesh dims {mesh_dims} divisible by 8)")
    n = positions.shape[0]
    cap = tile_capacity or sw.mesh_tile_capacity(n, mesh_dims)
    out = _domain_pme_impl(mesh, positions, jnp.asarray(charges),
                           jnp.asarray(cell, positions.dtype),
                           float(alpha), tuple(int(d) for d in mesh_dims),
                           int(order), int(cap), bool(compute_forces))
    energies, forces = out
    if compute_forces:
        return energies, forces
    return energies
