# SPDX-License-Identifier: Apache-2.0
"""Scalar math helpers (reference: nvalchemiops/math/math.py).

All functions are elementwise jnp expressions: they work on traced arrays,
under ``vmap``/``jit``, and inside Pallas kernel bodies.
"""

from __future__ import annotations

import jax.numpy as jnp


def divmod_floor(a, n):
    """Floor division and remainder with the sign convention of Python's divmod.

    Used for periodic wrapping of cell indices: for any integer ``a`` and
    positive ``n``, returns ``(d, m)`` with ``a = d*n + m`` and ``0 <= m < n``
    (reference semantics: math/math.py:40-48).
    """
    d = jnp.floor_divide(a, n)
    m = a - d * n
    return d, m


def safe_divide(num, den, eps=1e-12):
    """``num/den`` with denominators smaller than ``eps`` mapped to 0."""
    den_arr = jnp.asarray(den)
    small = jnp.abs(den_arr) < eps
    safe_den = jnp.where(small, jnp.ones_like(den_arr), den_arr)
    return jnp.where(small, jnp.zeros_like(num / safe_den), num / safe_den)


def exp_over_x(x, prefactor):
    """``exp(-prefactor * x) / x`` — the Ewald Green's-function radial factor.

    (reference: math/math.py:30-37 / pme_kernels.py:109-113).
    """
    return jnp.exp(-prefactor * x) / x


def erfc_approx(x):
    """Complementary error function via the Abramowitz–Stegun 7.1.26 polynomial.

    Max absolute error ~1.5e-7 — identical accuracy class to the device-side
    approximation the reference uses in all its electrostatics kernels
    (reference: math/math.py:51-93).  Unlike ``jax.scipy.special.erfc`` this
    consists only of mul/add/exp and is Pallas/TPU friendly.

    Supports negative arguments through ``erfc(-x) = 2 - erfc(x)``.
    """
    x = jnp.asarray(x)
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5 = -1.453152027, 1.061405429
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = poly * jnp.exp(-ax * ax)
    return jnp.where(x >= 0, y, 2.0 - y)


def sinc_normalized(x):
    """Normalized sinc ``sin(pi x)/(pi x)`` with a stable value of 1 at 0.

    (reference: pme_kernels.py:93-107).
    """
    x = jnp.asarray(x)
    small = jnp.abs(x) < 1e-6
    safe = jnp.where(small, jnp.ones_like(x), x)
    pix = jnp.pi * safe
    return jnp.where(small, jnp.ones_like(x), jnp.sin(pix) / pix)


def apply_mat3(vecs, m):
    """``vecs [.., 3] @ m [3, 3]`` as broadcast multiply-adds (exact f32).

    TPU lowers even tiny f32 matmuls to single-bf16-pass MXU ops
    (~4e-3 relative error) — measured 4.5% energy / 16% force error in
    the dense Coulomb path when fractional coordinates went through a
    ``positions @ inv_cell`` dot.  Coordinate transforms, force
    rotations, and k.r phases must stay on the VPU in full f32; this
    helper (and its phase sibling) is the mandated spelling.
    """
    return (vecs[..., 0:1] * m[0] + vecs[..., 1:2] * m[1]
            + vecs[..., 2:3] * m[2])


def dot_phases(positions, k_vectors):
    """``positions [.., n, 3] @ k_vectors [.., k, 3]^T`` exactly (VPU).

    The K=3 contraction is three broadcast outer products — no MXU, no
    bf16 truncation of coordinates or k-vectors (see :func:`apply_mat3`).
    """
    px = positions[..., :, 0:1]
    py = positions[..., :, 1:2]
    pz = positions[..., :, 2:3]
    kx = k_vectors[..., None, :, 0]
    ky = k_vectors[..., None, :, 1]
    kz = k_vectors[..., None, :, 2]
    return px * kx + py * ky + pz * kz
