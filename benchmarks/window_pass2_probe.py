# SPDX-License-Identifier: Apache-2.0
"""Isolate the window engine's pass-2 cost drivers.

Stages at the composite scale: (a) pass 1 + feature build + windowed
feature planes only; (b) pass 2 with the three MXU dots replaced by a
constant (elementwise cost); (c) pass 2 with per-(g, offset) dots (the
production body); (d) pass 2 with the offsets' rfT windows lane-concatened
into one rhs per g (5x fewer, 5x wider dots).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    _extend_like, _interior, build_atom_grid, choose_grid_geometry, fold_halo,
    gather_from_grid, scatter_rows_to_grid, scatter_to_grid,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    _d3_atom_features, compact_d3_elements, element_c6_mask,
)
from nvalchemiops_tpu.pallas.block_sweep import pack_columns  # noqa: E402
from nvalchemiops_tpu.pallas.window_sweep import (  # noqa: E402
    WINDOW_PARK, window_colsT, window_lane_width, window_rows, window_sweep,
)
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402

N_REP = int(os.environ.get("PROBE_NREP", "38"))
CUTOFF = 9.6


def main():
    dtype = jnp.float32
    pos_np, cell_np, numbers_np, charges_np, rcov_np, r4r2_np, cna_np, c6_np = (
        build_system(n_rep=N_REP)
    )
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pbc = np.array([True] * 3)

    numbers_j, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
    rcov, r4r2, c6, cna = (a.astype(dtype) for a in (rcov, r4r2, c6, cna))
    zmax1 = rcov.shape[0]
    mesh = cna.shape[1]
    zm = zmax1 * mesh

    dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, CUTOFF)
    origin = (jnp.asarray(origin_np, dtype)
              if origin_np is not None and np.asarray(origin_np).any() else None)
    cz, cy, cx = dims
    rz, ry, rx = radius
    lane_w = window_lane_width(cap, rx)
    print(f"N={n} dims={dims} cap={cap} lane_w={lane_w} zm={zm}", flush=True)
    dep = perturb_positions()

    numbers = jnp.asarray(numbers_j, INDEX_DTYPE)
    mask_elem = element_c6_mask(c6)
    rcov_a = rcov[numbers]
    r4r2_a = r4r2[numbers]
    cna_a = cna[numbers]
    mask_a = mask_elem.astype(dtype)[numbers]
    c6p = jnp.transpose(c6, (0, 2, 1, 3)).reshape(zmax1, mesh, zmax1 * mesh)
    c6p_a = c6p[numbers]
    cutoff_sq = CUTOFF * CUTOFF
    k1, k3 = 16.0, -4.0
    a1, a2, s6, s8 = 0.4, 4.2, 1.0, 1.8

    def prep(p, fdt):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        zf, rcov_pl, r4r2_pl = scatter_rows_to_grid(
            g, (numbers.astype(dtype), rcov_a, r4r2_a))
        z_ext = _extend_like(g, zf.astype(INDEX_DTYPE), 0)
        rcov_ext = _extend_like(g, rcov_pl, 0.0)
        from nvalchemiops_tpu.grid import DISPLACE, DISPLACE_SPACING
        ez, ey, ex = cz + 2 * rz, cy + 2 * ry, cx + 2 * rx
        ext_iota = jnp.arange(ez * ey * ex * cap, dtype=dtype).reshape(
            ez, ey, ex, cap)
        ext_px_d = g.ext_px + jnp.where(
            z_ext == 0, DISPLACE + ext_iota * DISPLACE_SPACING, 0.0)
        pxw = window_rows(ext_px_d, rx, cap, lane_w, park=WINDOW_PARK)
        pyw = window_rows(g.ext_py, rx, cap, lane_w)
        pzw = window_rows(g.ext_pz, rx, cap, lane_w)
        rcovw = window_rows(rcov_ext, rx, cap, lane_w)
        geom_own = (_interior(g, ext_px_d), _interior(g, g.ext_py),
                    _interior(g, g.ext_pz))

        def geom(s, crow):
            dx = crow["px"] - s[:, 0:1][None]
            dy = crow["py"] - s[:, 1:2][None]
            dz = crow["pz"] - s[:, 2:3][None]
            d2 = dx * dx + dy * dy + dz * dz
            ok = (d2 > 1e-20) & (d2 < cutoff_sq)
            r2m = jnp.where(ok, d2, 1.0)
            return ok, jax.lax.rsqrt(r2m), r2m, dx, dy, dz

        def apply_home(ok, home):
            return jnp.concatenate([ok[0:1] & home[None], ok[1:]], axis=0)

        def cn_body(own, crow, ccolt, home):
            s = own["s"]
            ok, inv_r, *_ = geom(s, crow)
            ok = apply_home(ok, home)
            rc = s[:, 3:4][None] + crow["rcov"]
            f = jnp.where(
                ok, 1.0 / (1.0 + jnp.exp(-k1 * (rc * inv_r - 1.0))), 0.0)
            return (f,), (f,)

        own1 = {"s": pack_columns(*geom_own, rcov_pl)}
        (cn_own,), (cn_acc,) = window_sweep(
            dims, radius, cap, own1,
            {"px": pxw, "py": pyw, "pz": pzw, "rcov": rcovw}, {},
            cn_body, 1, 1, lane_w=lane_w, dtype=dtype,
            interpret=jax.default_backend() != "tpu")
        cn_a = gather_from_grid(g, cn_own + fold_halo(g, cn_acc))

        l0_a, l1c_a, rf_a, rfdc_a, w_a, _ = _d3_atom_features(
            numbers, cn_a, cna_a, mask_a, c6p_a, k3, dtype)

        def feat_plane(vals):
            nslots = cz * cy * cx * cap
            buf = jnp.zeros((nslots + 1, vals.shape[-1]), vals.dtype)
            return buf.at[g.flat_slot].set(vals)[:-1].reshape(
                cz, cy, cx, cap, vals.shape[-1])

        lf_cols = feat_plane(
            jnp.concatenate([l0_a, l1c_a], -1).astype(fdt)
        ).reshape(cz, cy, cx * cap, 2 * zm)
        rfT_w = window_colsT(_extend_like(g, feat_plane(rf_a.astype(fdt)),
                                          0.0), rx, cap, lane_w)
        rfdcT_w = window_colsT(_extend_like(g, feat_plane(rfdc_a.astype(fdt)),
                                            0.0), rx, cap, lane_w)
        w_pl = scatter_to_grid(g, w_a)
        w_ext = _extend_like(g, w_pl, 0.0)
        si_pl = jnp.sqrt(r4r2_pl * 1.7320508075688772)
        si_ext = jnp.sqrt(_extend_like(g, r4r2_pl, 0.0) * 1.7320508075688772)
        own2 = {"s": pack_columns(*geom_own, si_pl, w_pl), "lf": lf_cols}
        wrows2 = {"px": pxw, "py": pyw, "pz": pzw,
                  "si": window_rows(si_ext, rx, cap, lane_w),
                  "w": window_rows(w_ext, rx, cap, lane_w)}
        return (g, own2, wrows2, {"rfT": rfT_w, "rfdcT": rfdcT_w},
                geom, apply_home)

    def make_p2(dots: str):
        def direct_body(own, crow, ccolt, home):
            s = own["s"]
            ok, inv_r, r2_, dx, dy, dz = None, None, None, None, None, None
            dxc = crow["px"] - s[:, 0:1][None]
            dyc = crow["py"] - s[:, 1:2][None]
            dzc = crow["pz"] - s[:, 2:3][None]
            d2 = dxc * dxc + dyc * dyc + dzc * dzc
            ok = (d2 > 1e-20) & (d2 < cutoff_sq)
            ok = jnp.concatenate([ok[0:1] & home[None], ok[1:]], axis=0)
            r2_ = jnp.where(ok, d2, 1.0)
            lf = own["lf"]
            l0 = lf[:, :zm]
            l1c = lf[:, zm:]
            dn = (((1,), (0,)), ((), ()))
            n_off = len(ccolt["rfT"])
            if dots == "none":
                zacc = jnp.broadcast_to(s[:, 4:5][None] * crow["w"],
                                        d2.shape) + 1.0
                z_di = zacc * 0.5
                z_dj = zacc * 0.25
            elif dots == "concat":
                rfT = jnp.concatenate(list(ccolt["rfT"]), axis=-1)
                rfdcT = jnp.concatenate(list(ccolt["rfdcT"]), axis=-1)
                L = crow["px"].shape[-1]

                def split(m):
                    return jnp.stack(
                        [m[:, o * L:(o + 1) * L] for o in range(n_off)], 0)

                zacc = split(jax.lax.dot_general(
                    l0, rfT, dn, preferred_element_type=dtype))
                z_di = split(jax.lax.dot_general(
                    l1c, rfT, dn, preferred_element_type=dtype))
                z_dj = split(jax.lax.dot_general(
                    l0, rfdcT, dn, preferred_element_type=dtype))
            else:
                zacc = jnp.stack([
                    jax.lax.dot_general(l0, t, dn,
                                        preferred_element_type=dtype)
                    for t in ccolt["rfT"]], 0)
                z_di = jnp.stack([
                    jax.lax.dot_general(l1c, t, dn,
                                        preferred_element_type=dtype)
                    for t in ccolt["rfT"]], 0)
                z_dj = jnp.stack([
                    jax.lax.dot_general(l0, t, dn,
                                        preferred_element_type=dtype)
                    for t in ccolt["rfdcT"]], 0)
            w = s[:, 4:5][None] * crow["w"]
            good = w > 1e-12
            w_inv = 1.0 / jnp.where(good, w, 1.0)
            c6v = jnp.where(good, zacc * w_inv, 0.0)
            pair_good = ok & (c6v >= 1e-12)
            t_ = s[:, 3:4][None] * crow["si"]
            rr = t_ * t_
            r0 = a1 * t_ + a2
            r4 = r2_ * r2_
            r6 = r4 * r2_
            r8 = r4 * r4
            r0_2 = r0 * r0
            r0_6 = r0_2 * r0_2 * r0_2
            r0_8 = r0_6 * r0_2
            den6 = r6 + r0_6
            den8 = r8 + r0_8
            rec = 1.0 / (den6 * den8)
            den6_inv = rec * den8
            den8_inv = rec * den6
            damp_sum = s6 * den6_inv + s8 * rr * den8_inv
            e_ij = jnp.where(pair_good, -c6v * damp_sum, 0.0)
            dd6 = -6.0 * s6 * r4 * den6_inv * den6_inv
            dd8 = -8.0 * s8 * rr * r6 * den8_inv * den8_inv
            coef = jnp.where(pair_good, -c6v * (dd6 + dd8), 0.0)
            cfx = coef * dxc
            cfy = coef * dyc
            cfz = coef * dzc
            m = jnp.where(pair_good, (-2.0 * k3) * damp_sum * w_inv, 0.0)
            return ((e_ij, cfx, cfy, cfz, m * z_di),
                    (("neg", cfx), ("neg", cfy), ("neg", cfz), m * z_dj))
        return direct_body

    for fdt_name, fdt in (("f32", dtype), ("bf16", jnp.bfloat16)):
        def feat_only(p, fdt=fdt):
            g, own2, wrows2, wcolt, *_ = prep(p, fdt)
            return (jnp.sum(own2["lf"].astype(dtype)),
                    jnp.sum(wcolt["rfT"].astype(dtype)))

        t = measure(feat_only, dep, (pos,), iters=3)
        print(f"p1+features ({fdt_name})   : {t*1e3:8.2f} ms (incl build)",
              flush=True)

        for dots in ("none", "per-offset", "concat"):
            def p2(p, fdt=fdt, dots=dots):
                g, own2, wrows2, wcolt, *_ = prep(p, fdt)
                accs, jaccs = window_sweep(
                    dims, radius, cap, own2, wrows2, wcolt,
                    make_p2(dots), 5, 4, lane_w=lane_w, dtype=dtype,
                    interpret=jax.default_backend() != "tpu")
                return accs[0], accs[1] + fold_halo(g, jaccs[0])

            try:
                t = measure(p2, dep, (pos,), iters=3)
                print(f"p1+feat+p2 dots={dots:10s} ({fdt_name}): "
                      f"{t*1e3:8.2f} ms (incl build)", flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"p2 dots={dots} ({fdt_name}) FAILED "
                      f"{type(exc).__name__}: {exc}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
