# SPDX-License-Identifier: Apache-2.0
"""VMEM-resident Mosaic kernel for the voxel-stencil pair sweep.

The XLA stencil sweep (stencil.py) is granularity-bound on TPU: its
(2R+1)^3/2 half-space steps are ~20-op chains over [Cz, Ey*Ex] planes
(~560 KB at 110k atoms), each too small to amortize kernel launch and
HBM round-trips, and the steps serialize through the carry — measured
~48 us/step, 3x slower per slot than the row sweep despite 2.5x fewer
slots.  Here the whole problem lives in VMEM (~6 MB at 110k atoms) and
every offset is an in-register vector op chain.

This kernel uses the FULL-space sweep (all (2R+1)^3 - 1 offsets, own-side
accumulation only): each voxel computes its own energy/force from both
pair directions, which removes the j-side scatter entirely — Mosaic
cannot scatter-add to values, and unaligned ref-slice accumulation
lowers to slow shuffles.  2x the pair visits, but all of them at VPU
rate with zero HBM intermediates; the half-space XLA path keeps the
fold-based formulation for CPU and as the reference implementation.

Grid: one program per Cz-chunk of own z-rows; candidate planes are
unblocked VMEM residents sliced per offset with static (per-program
dynamic-start) loads.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _full_offsets(radius):
    rz, ry, rx = radius
    return [
        (dz, dy, dx)
        for dz in range(-rz, rz + 1)
        for dy in range(-ry, ry + 1)
        for dx in range(-rx, rx + 1)
        if (dz, dy, dx) != (0, 0, 0)
    ]


def stencil_sweep_fullspace(sg, ext_named, own_named, body, num_out: int,
                            chunk: int = 16, interpret: bool = False):
    """Run ``body`` over every (own voxel, offset) pair, own-side only.

    ``ext_named``/``own_named``: tuples of (name, plane) with planes
    [Ez, F] / [Cz, Ey*Ex] (see stencil.py layouts; position planes are
    added automatically).  ``body(own, cand) -> tuple[num_out]`` returns
    per-own-slot contributions of one offset; the harness sums them over
    all offsets and returns ``num_out`` interior-shaped [Cz, Ey*Ex]
    accumulators (strip halo columns with ``stencil.own_interior``).
    """
    from nvalchemiops_tpu.stencil import (
        _interior_of_ext, own_flat_from_interior,
    )
    from nvalchemiops_tpu.grid import DISPLACE

    rz, ry, rx = sg.radius
    cz = sg.dims[0]
    ez, ey, ex = sg.ext_dims
    pad = sg.col_pad
    W0 = ey * ex
    dtype = sg.ext_px.dtype
    offsets = _full_offsets(sg.radius)

    ext = [("px", sg.ext_px), ("py", sg.ext_py), ("pz", sg.ext_pz)]
    ext += list(ext_named)
    own = [
        ("px", own_flat_from_interior(sg, _interior_of_ext(sg, sg.ext_px),
                                      -DISPLACE)),
        ("py", own_flat_from_interior(sg, _interior_of_ext(sg, sg.ext_py))),
        ("pz", own_flat_from_interior(sg, _interior_of_ext(sg, sg.ext_pz))),
    ]
    own += list(own_named)
    n_ext = len(ext)
    n_own = len(own)

    def kernel(*refs):
        # Single program, everything VMEM-resident.  Mosaic cannot prove
        # sublane alignment for ref loads at arbitrary z starts, so the
        # candidate planes are loaded ONCE as values and every offset is
        # a fully static value slice.
        ext_refs = refs[:n_ext]
        own_refs = refs[n_ext:n_ext + n_own]
        out_refs = refs[n_ext + n_own:]

        ext_vals = [r[...] for r in ext_refs]
        own_vals = {name: own_refs[i][...]
                    for i, (name, _) in enumerate(own)}
        acc = [jnp.zeros((cz, W0), dtype) for _ in range(num_out)]
        for dz, dy, dx in offsets:
            c0 = pad + dy * ex + dx
            cand = {}
            for i, (name, _) in enumerate(ext):
                cand[name] = jax.lax.slice(
                    ext_vals[i], (rz + dz, c0), (rz + dz + cz, c0 + W0))
            outs = body(own_vals, cand)
            acc = [a + o for a, o in zip(acc, outs)]
        for r, a in zip(out_refs, acc):
            r[...] = a

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        in_specs=[vmem] * (n_ext + n_own),
        out_specs=[vmem] * num_out,
        out_shape=[jax.ShapeDtypeStruct((cz, W0), dtype)] * num_out,
        interpret=interpret,
    )(*[p for _, p in ext], *[p for _, p in own])
    return tuple(outs)


# ---------------------------------------------------------------------------
# Full-space pair bodies (same math as stencil.py's half-space kernels;
# energies split half to each side, forces/CN accumulate per own atom)
# ---------------------------------------------------------------------------


def _geom(own, cand, cutoff_sq):
    dx = cand["px"] - own["px"]
    dy = cand["py"] - own["py"]
    dz = cand["pz"] - own["pz"]
    d2 = dx * dx + dy * dy + dz * dz
    ok = (d2 < cutoff_sq) & (d2 > 1e-20)
    r2m = jnp.where(ok, d2, 1.0)
    inv_r = jax.lax.rsqrt(r2m)
    return ok, inv_r, r2m, dx, dy, dz


def coulomb_body(cutoff, alpha):
    """Per-slot (damped-)Coulomb body for the fullspace stencil sweep.

    Returns ``body(own, cand) -> (e_pair, fx, fy, fz)`` matching
    ``stencil_sweep_fullspace``'s contract; same math as
    ``grid._coulomb_impl`` (reference: electrostatics/coulomb.py kernels).
    """
    from nvalchemiops_tpu.mathops.math import erfc_approx

    cutoff_sq = float(cutoff) ** 2
    alpha_t = float(alpha)
    two_over_sqrt_pi = 1.1283791670955126

    def body(own, cand):
        ok, inv_r, r2m, dx, dy, dz = _geom(own, cand, cutoff_sq)
        qq = own["q"] * cand["q"]
        if alpha_t > 0:
            ar = alpha_t * (r2m * inv_r)
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
        # force on own atom: -sum coef * d (d points own -> cand)
        return e_pair, -coef * dx, -coef * dy, -coef * dz

    return body


def cn_body(cutoff, k1):
    """D3 coordination-number body (logistic counting fn) for the
    fullspace stencil sweep (reference: dispersion/dftd3.py:832-940)."""
    cutoff_sq = float(cutoff) ** 2
    k1 = float(k1)

    def body(own, cand):
        ok, inv_r, _r2m, *_ = _geom(own, cand, cutoff_sq)
        rc = own["rcov"] + cand["rcov"]
        f = jnp.where(ok, 1.0 / (1.0 + jnp.exp(-k1 * (rc * inv_r - 1.0))), 0.0)
        return (f,)

    return body


def chain_body(cutoff, k1):
    """D3 CN chain-rule force body for the fullspace stencil sweep
    (reference: dispersion/dftd3.py:1133-1258)."""
    cutoff_sq = float(cutoff) ** 2
    k1 = float(k1)

    def body(own, cand):
        ok, inv_r, _r2m, dx, dy, dz = _geom(own, cand, cutoff_sq)
        rc = own["rcov"] + cand["rcov"]
        rrq = rc * inv_r
        f_cn = 1.0 / (1.0 + jnp.exp(-k1 * (rrq - 1.0)))
        dcn_dr_r = -f_cn * (1.0 - f_cn) * k1 * rrq * inv_r * inv_r
        coef = jnp.where(ok, (own["decn"] + cand["decn"]) * dcn_dr_r, 0.0)
        return coef * dx, coef * dy, coef * dz

    return body
