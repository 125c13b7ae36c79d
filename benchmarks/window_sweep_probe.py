# SPDX-License-Identifier: Apache-2.0
"""Prototype probe: per-cell 128-aligned window sweep for the D3 passes.

The floor probe (mosaic_floor_probe.py) fit the block-sweep cost model
``t_pass ~ n_blocks * 200ns + slots * 0.75ps/op``: the G-merged window
design pays (G+2Rx)/G ~ 1.8x slot slack, and per-cell blocks (G=1) pay
the fixed cost 16x more often with a 33%-padded 96-lane window.

This prototype removes both: candidate planes are PRE-WINDOWED in XLA
(per x-cell g, the 3-cell window [g-1, g+2) packed to a 128-lane-aligned
slice, lane pad parked far away), so the kernel runs one [n_off, cap, 128]
3D block per own cell — minimal slots (4096 blocks x 25.6k slots =
104.9M/pass at CsCl dims 16 cap 40) with every slice 128-aligned.

Measures: trivial pair-count body, the CN body (pass 1), and a direct-
body-shaped op load (pass 2 with VPU-MAC bilinears), vs the XLA engine.
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid, choose_grid_geometry, _interior,
)
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402

N_REP = int(os.environ.get("PROBE_NREP", "38"))
PARK = 1.0e7  # lane-pad park displacement (x plane only)


def window_plane(p, rx, cap, park=0.0):
    """[ez, ey, ex, cap] -> [ez, ey, cx*128] pre-windowed (3-cell, aligned).

    Window g packs cells (g+rx-1, g+rx, g+rx+1) into lanes [g*128,
    g*128+3*cap); the lane pad is ``park`` (far-away x for position
    planes so the distance test alone excludes it).
    """
    ez, ey, ex, _ = p.shape
    cx = ex - 2 * rx
    w3 = jnp.concatenate(
        [p[:, :, rx - 1 + i: rx - 1 + i + cx] for i in range(3)], axis=-1
    ).reshape(ez, ey, cx, 3 * cap)
    pad = 128 - 3 * cap
    w3 = jnp.pad(w3, ((0, 0), (0, 0), (0, 0), (0, pad)),
                 constant_values=park)
    return w3.reshape(ez, ey, 1, cx * 128)


def make_sweep(dims, radius, cap, body, n_own_out, n_j_out, n_cand_planes,
               own_feat_cols):
    """Per-cell windowed pair sweep: grid (cz, cy), one 3D block per cell.

    ``body(own_s, own_lf, cands, allow) -> (own_blocks, j_blocks)`` with
    own_s [cap, 8], own_lf [cap, F] or None, cands: list of n_cand_planes
    arrays [n_off, 1, 128] (stacked offsets), allow [n_off, cap, 128]
    static mask.  own_blocks: [n_off, cap, 128] each (row-reduced here),
    j_blocks likewise (column-reduced per offset).
    """
    cz, cy, cx = dims
    rz, ry, rx = radius
    assert 3 * cap <= 128
    offs = [(0, 0)] + [
        (dz, dy) for dz in range(-rz, rz + 1) for dy in range(-ry, ry + 1)
        if dz > 0 or (dz == 0 and dy > 0)
    ]
    n_off = len(offs)
    lrow = cx * cap
    lwin = cx * 128

    # static pair-once mask for the home offset (index 0), built in-kernel
    # from iotas (Mosaic-friendly): within the 3-cell window, cell g-1 is
    # excluded (covered by g-1's own home) and cell g keeps the upper
    # triangle; cells g+1 and pad are kept (pad lanes park out via
    # distance).
    def home_allow():
        lane = jax.lax.broadcasted_iota(jnp.int32, (cap, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (cap, 128), 0)
        return (lane >= 2 * cap) | ((lane >= cap) & (lane - cap > row))

    dz_arr = jnp.asarray([o[0] + rz for o in offs], INDEX_DTYPE)
    dy_arr = jnp.asarray([o[1] + ry for o in offs], INDEX_DTYPE)

    def kernel(dzr, dyr, *refs):
        s_ref = refs[0]
        lf_ref = refs[1] if own_feat_cols else None
        cand_refs = refs[(2 if own_feat_cols else 1):
                         (2 if own_feat_cols else 1) + n_cand_planes * n_off]
        base = (2 if own_feat_cols else 1) + n_cand_planes * n_off
        own_out = refs[base: base + n_own_out]
        j_out = refs[base + n_own_out: base + n_own_out + n_j_out]
        scratch = refs[base + n_own_out + n_j_out:]

        for a in scratch:
            a[:] = jnp.zeros((lrow, 8), jnp.float32)
        for r in j_out:
            r[0, 0] = jnp.zeros((n_off, 1, lwin), jnp.float32)

        for g in range(cx):
            s = s_ref[0, 0, g * cap:(g + 1) * cap, :]
            lf = (lf_ref[0, 0, g * cap:(g + 1) * cap, :]
                  if own_feat_cols else None)
            sl = slice(g * 128, (g + 1) * 128)
            cands = []
            for p in range(n_cand_planes):
                piece = [cand_refs[p * n_off + o][0, 0, 0:1, sl]
                         for o in range(n_off)]
                cands.append(jnp.stack(piece, axis=0))  # [n_off, 1, 128]
            own_blocks, j_blocks = body(s, lf, cands, home_allow())
            for a, blk in zip(scratch, own_blocks):
                a[g * cap:(g + 1) * cap, 0:1] += jnp.sum(
                    blk, axis=(0, 2))[:, None]
            for r, blk in zip(j_out, j_blocks):
                if isinstance(blk, tuple) and blk[0] == "neg":
                    r[0, 0, :, 0:1, sl] += -jnp.sum(
                        blk[1], axis=1, keepdims=True)
                else:
                    r[0, 0, :, 0:1, sl] += jnp.sum(blk, axis=1, keepdims=True)

        i8 = jnp.eye(8, dtype=jnp.float32)
        for r, a in zip(own_out, scratch):
            r[0, 0] = jax.lax.dot_general(
                i8, a[:], (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

    def run(own_s_cols, own_lf_cols, cand_planes):
        in_specs = [pl.BlockSpec((1, 1, lrow, own_s_cols.shape[-1]),
                                 lambda z, y, dzr, dyr: (z, y, 0, 0),
                                 memory_space=pltpu.VMEM)]
        inputs = [own_s_cols]
        if own_feat_cols:
            in_specs.append(pl.BlockSpec(
                (1, 1, lrow, own_lf_cols.shape[-1]),
                lambda z, y, dzr, dyr: (z, y, 0, 0),
                memory_space=pltpu.VMEM))
            inputs.append(own_lf_cols)
        for p in cand_planes:
            for o in range(n_off):
                in_specs.append(pl.BlockSpec(
                    (1, 1, 1, lwin),
                    partial(lambda z, y, dzr, dyr, o=0: (
                        z + dzr[o], y + dyr[o], 0, 0), o=o),
                    memory_space=pltpu.VMEM))
                inputs.append(p)
        own_out_specs = [pl.BlockSpec((1, 1, 8, lrow),
                                      lambda z, y, dzr, dyr: (z, y, 0, 0),
                                      memory_space=pltpu.VMEM)
                         for _ in range(n_own_out)]
        j_out_specs = [pl.BlockSpec((1, 1, n_off, 1, lwin),
                                    lambda z, y, dzr, dyr: (z, y, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
                       for _ in range(n_j_out)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cz, cy),
            in_specs=in_specs,
            out_specs=tuple(own_out_specs + j_out_specs),
            scratch_shapes=[pltpu.VMEM((lrow, 8), jnp.float32)
                            for _ in range(n_own_out)],
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(
                [jax.ShapeDtypeStruct((cz, cy, 8, lrow), jnp.float32)
                 for _ in range(n_own_out)]
                + [jax.ShapeDtypeStruct((cz, cy, n_off, 1, lwin), jnp.float32)
                   for _ in range(n_j_out)]),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=bool(int(os.environ.get("PROBE_INTERPRET", "0"))),
        )(dz_arr, dy_arr, *inputs)
        own_accs = tuple(a[:, :, 0, :].reshape(cz, cy, cx, cap)
                         for a in outs[:n_own_out])
        return own_accs, outs[n_own_out:], offs

    return run


def fold_j(dims, radius, cap, offs, j_win):
    """[cz, cy, n_off, 1, cx*128] windowed j accumulator -> ext planes sum."""
    cz, cy, cx = dims
    rz, ry, rx = radius
    ez, ey, ex = cz + 2 * rz, cy + 2 * ry, cx + 2 * rx
    jw = j_win[:, :, :, 0, :].reshape(cz, cy, len(offs), cx, 128)[..., :3 * cap]
    jw = jw.reshape(cz, cy, len(offs), cx, 3, cap)
    acc = jnp.zeros((ez, ey, ex, cap), jnp.float32)
    for oi, (dz, dy) in enumerate(offs):
        for c in range(3):
            acc = acc.at[rz + dz: rz + dz + cz,
                         ry + dy: ry + dy + cy,
                         rx - 1 + c: rx - 1 + c + cx].add(jw[:, :, oi, :, c])
    return acc


def main():
    dtype = jnp.float32
    pos_np, cell_np, numbers_np, charges_np, rcov_np, r4r2_np, cna_np, c6_np = (
        build_system(n_rep=N_REP)
    )
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pbc = np.array([True] * 3)
    cutoff = 9.0
    k1 = 16.0

    dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
    origin = (jnp.asarray(origin_np, dtype)
              if origin_np is not None and np.asarray(origin_np).any() else None)
    cz, cy, cx = dims
    rz, ry, rx = radius
    print(f"N={n} dims={dims} cap={cap} blocks/pass={cz*cy*cx} "
          f"slots/pass={cz*cy*cx*5*cap*128/1e6:.1f}M", flush=True)
    if 3 * cap > 128:
        print("cap too large for the 128-lane window; abort", flush=True)
        return

    from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (
        compact_d3_elements,
    )
    numbers, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
    rcov = rcov.astype(dtype)

    dep = perturb_positions()

    def pack_own(g, extra=()):
        cols = [_interior(g, g.ext_px), _interior(g, g.ext_py),
                _interior(g, g.ext_pz)] + list(extra)
        st = jnp.stack([c.astype(dtype) for c in cols], axis=-1)
        st = jnp.pad(st, ((0, 0),) * 3 + ((0, 0), (0, 8 - len(cols))))
        return st.reshape(cz, cy, cx * cap, 8)

    # rcov scattered to planes via the grid's own machinery
    from nvalchemiops_tpu.grid import scatter_to_grid, _extend_like

    cutoff_sq = cutoff * cutoff

    # ---- trivial body ------------------------------------------------------
    def trivial_body(s, lf, cands, home):
        pxw, pyw, pzw = cands
        dx = pxw - s[:, 0:1][None]
        dy = pyw - s[:, 1:2][None]
        dz = pzw - s[:, 2:3][None]
        d2 = dx * dx + dy * dy + dz * dz
        f = jnp.where((d2 < cutoff_sq) & (d2 > 1e-20), 1.0, 0.0)
        f = jnp.concatenate(
            [jnp.where(home[None], f[0:1], 0.0), f[1:]], axis=0)
        return (f,), (f,)

    sweep_triv = make_sweep(dims, radius, cap, trivial_body, 1, 1, 3, False)

    def run_trivial(p):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        pxw = window_plane(g.ext_px.reshape(cz + 2 * rz, cy + 2 * ry,
                                            cx + 2 * rx, cap), rx, cap,
                           park=PARK)
        pyw = window_plane(g.ext_py.reshape(cz + 2 * rz, cy + 2 * ry,
                                            cx + 2 * rx, cap), rx, cap)
        pzw = window_plane(g.ext_pz.reshape(cz + 2 * rz, cy + 2 * ry,
                                            cx + 2 * rx, cap), rx, cap)
        (cnt,), j_outs, offs = sweep_triv(pack_own(g), None, [pxw, pyw, pzw])
        return jnp.sum(cnt) + jnp.sum(fold_j(dims, radius, cap, offs,
                                             j_outs[0]))

    check_only = bool(int(os.environ.get("PROBE_CHECK_ONLY", "0")))
    if not check_only:
        t_build = measure(
            lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                      origin=origin), dep, (pos,), iters=8)
        print(f"grid build       : {t_build*1e3:8.2f} ms", flush=True)
        t = measure(run_trivial, dep, (pos,), iters=3)
        print(f"window trivial   : {max(t - t_build, 0)*1e3:8.2f} ms "
              f"(excl build)", flush=True)

    # ---- CN body (pass 1, real math) --------------------------------------
    def cn_body(s, lf, cands, home):
        pxw, pyw, pzw, rcw = cands
        dx = pxw - s[:, 0:1][None]
        dy = pyw - s[:, 1:2][None]
        dz = pzw - s[:, 2:3][None]
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 < cutoff_sq) & (d2 > 1e-20)
        inv_r = jax.lax.rsqrt(jnp.where(ok, d2, 1.0))
        rc = s[:, 3:4][None] + rcw
        f = jnp.where(ok, 1.0 / (1.0 + jnp.exp(-k1 * (rc * inv_r - 1.0))),
                      0.0)
        f = jnp.concatenate(
            [jnp.where(home[None], f[0:1], 0.0), f[1:]], axis=0)
        return (f,), (f,)

    sweep_cn = make_sweep(dims, radius, cap, cn_body, 1, 1, 4, False)

    def run_cn(p):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        rcov_a = rcov[numbers]
        rcov_pl = scatter_to_grid(g, rcov_a)
        rcov_ext = _extend_like(g, rcov_pl, 0.0)
        shp = (cz + 2 * rz, cy + 2 * ry, cx + 2 * rx, cap)
        pxw = window_plane(g.ext_px.reshape(shp), rx, cap, park=PARK)
        pyw = window_plane(g.ext_py.reshape(shp), rx, cap)
        pzw = window_plane(g.ext_pz.reshape(shp), rx, cap)
        rcw = window_plane(rcov_ext.reshape(shp), rx, cap)
        (cn_own,), j_outs, offs = sweep_cn(
            pack_own(g, (rcov_pl,)), None,
            [pxw, pyw, pzw, rcw])
        from nvalchemiops_tpu.grid import fold_halo
        cn = cn_own + fold_halo(g, fold_j(dims, radius, cap, offs, j_outs[0]))
        return cn

    if not check_only:
        try:
            t = measure(run_cn, dep, (pos,), iters=3)
            print(f"window CN pass   : {max(t - t_build, 0)*1e3:8.2f} ms "
                  f"(excl build)", flush=True)
        except Exception as exc:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            print(f"window CN FAILED {type(exc).__name__}: {exc}", flush=True)

    # correctness cross-check vs the XLA engine's CN (sum comparison)
    try:
        from nvalchemiops_tpu.interactions.dispersion.grid_d3 import grid_dftd3
        g = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)
        cn_win = run_cn(pos)
        _, _, cn_x = grid_dftd3(
            g, numbers, rcov, r4r2.astype(dtype), c6.astype(dtype),
            cna.astype(dtype), cutoff, 0.4, 4.2, 1.8, engine="xla")
        from nvalchemiops_tpu.grid import gather_from_grid
        cn_win_a = gather_from_grid(g, cn_win)
        err = float(jnp.max(jnp.abs(cn_win_a - cn_x)))
        print(f"CN max |win - xla| = {err:.3e} (scale "
              f"{float(jnp.max(cn_x)):.3f})", flush=True)
    except Exception as exc:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        print(f"CN check FAILED {type(exc).__name__}: {exc}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
