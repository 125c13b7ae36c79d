# SPDX-License-Identifier: Apache-2.0
"""Probe: variants of the pass-2 bilinear einsums inside the row sweep.

Hypothesis: the per-offset cost is dominated by materializing the windowed
candidate feature plane (concat [4096, 3*cap, 85] f32 ~ 200 MB per offset),
not the MXU time.  Variants:
  base      — merged-window einsum, f32 features (current grid_d3)
  bf16      — feature planes stored bf16
  chunks    — three per-chunk einsums against contiguous slices (no concat)
  chunksbf  — per-chunk + bf16
  winonly   — build the window, sum it (no einsum): isolates concat cost
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.grid import (
    estimate_grid_geometry, build_atom_grid, row_home_mask,
    _extend_like, _interior, fold_halo, _halfspace_offsets,
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
zm = 85

dims, radius, cap = estimate_grid_geometry(cell, pbc, cutoff, n, target_occupancy=0.75)
cap = 48
cz, cy, cx = dims
rz, ry, rx = radius
featL = jnp.asarray(rng.normal(size=(n, 2 * zm)), jnp.float32)
featR = jnp.asarray(rng.normal(size=(n, zm)), jnp.float32)
print(f"N={n} dims={dims} cap={cap}", flush=True)


def make_run(kind):
    fdt = jnp.bfloat16 if kind in ("bf16", "chunksbf") else jnp.float32
    per_chunk = kind in ("chunks", "chunksbf")

    @jax.jit
    def run(p):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap)
        upper = row_home_mask(cap, rx)

        def fp(vals):
            nslots = cz * cy * cx * cap
            buf = jnp.zeros((nslots + 1, vals.shape[-1]), fdt)
            return buf.at[g.flat_slot].set(vals.astype(fdt))[:-1].reshape(
                cz, cy, cx, cap, vals.shape[-1])
        lf = fp(featL)
        rf_ext = _extend_like(g, fp(featR), jnp.zeros((), fdt))
        px_own = _interior(g, g.ext_px)
        acc = jnp.zeros((cz, cy, cx, cap), jnp.float32)

        def offset_blocks(z0, y0, chunks):
            """List of (rf_slice [cz,cy,cx,cap,zm], px_slice) per x-chunk."""
            out = []
            for c in chunks:
                out.append((
                    rf_ext[z0:z0 + cz, y0:y0 + cy, c:c + cx],
                    g.ext_px[z0:z0 + cz, y0:y0 + cy, c:c + cx],
                ))
            return out

        def body(acc, z0, y0, chunks, home):
            if kind == "winonly":
                w = jnp.concatenate(
                    [rf_ext[z0:z0 + cz, y0:y0 + cy, c:c + cx] for c in chunks], axis=3)
                return acc + jnp.sum(w.astype(jnp.float32), axis=(-1, -2))[..., None]
            if per_chunk:
                for ci, (rfc, pxc) in enumerate(offset_blocks(z0, y0, chunks)):
                    z1 = jnp.einsum("...if,...jf->...ij", lf[..., :zm], rfc,
                                    preferred_element_type=jnp.float32)
                    z2 = jnp.einsum("...if,...jf->...ij", lf[..., zm:], rfc,
                                    preferred_element_type=jnp.float32)
                    dx = pxc[..., None, :] - px_own[..., :, None]
                    ok = jnp.abs(dx) < cutoff
                    if home and chunks[ci] == rx:
                        si = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
                        sj = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
                        ok &= (si < sj).reshape(1, 1, 1, cap, cap)
                    acc = acc + jnp.sum(jnp.where(ok, z1 + z2, 0.0), axis=-1)
                return acc
            w = jnp.concatenate(
                [rf_ext[z0:z0 + cz, y0:y0 + cy, c:c + cx] for c in chunks], axis=3)
            pxw = jnp.concatenate(
                [g.ext_px[z0:z0 + cz, y0:y0 + cy, c:c + cx] for c in chunks], axis=3)
            z1 = jnp.einsum("...if,...jf->...ij", lf[..., :zm], w,
                            preferred_element_type=jnp.float32)
            z2 = jnp.einsum("...if,...jf->...ij", lf[..., zm:], w,
                            preferred_element_type=jnp.float32)
            dx = pxw[..., None, :] - px_own[..., :, None]
            ok = jnp.abs(dx) < cutoff
            if home:
                ok &= upper[..., :dx.shape[-1]]
            return acc + jnp.sum(jnp.where(ok, z1 + z2, 0.0), axis=-1)

        acc = body(acc, rz, ry, list(range(rx, 2 * rx + 1)), True)
        for dz, dy in [(0, 1), (1, -1), (1, 0), (1, 1)]:
            acc = body(acc, dz + rz, dy + ry, list(range(2 * rx + 1)), False)
        return acc

    return run


for kind in ["winonly", "base", "bf16", "chunks", "chunksbf"]:
    t = measure(make_run(kind), dep, (pos,), iters=3)
    print(f"{kind:9s}: {t*1e3:7.2f} ms", flush=True)
