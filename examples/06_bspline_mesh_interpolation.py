# SPDX-License-Identifier: Apache-2.0
"""B-spline mesh interpolation: basis, spread/gather, deconvolution.

Counterpart of the reference's bspline visualization example
(examples/electrostatics/plot_bspline.py): evaluates the order-1..4
cardinal B-spline bases, demonstrates the partition-of-unity and
charge-conservation identities, the spread<->gather adjointness that PME
relies on, and the Fourier-space deconvolution factors.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nvalchemiops_tpu.spline import (
    bspline_weight,
    compute_bspline_deconvolution,
    spline_gather,
    spline_spread,
)

rng = np.random.default_rng(0)

# --- 1. the cardinal B-spline basis -----------------------------------------
# bspline_weight(u, order) evaluates the cardinal basis M_order(u) on
# [0, order).  For a point at fractional offset f, the stencil weights on
# the `order` surrounding mesh points are M(f), M(f+1), ..., M(f+order-1)
# — and they sum to 1 (partition of unity), which is what makes spreading
# conserve total charge.
f = 0.25
for order in (1, 2, 3, 4):
    w = bspline_weight(f + jnp.arange(order, dtype=jnp.float32), order)
    print(f"order {order}: stencil@f=0.25 = {np.round(np.asarray(w), 4)}"
          f"  sum = {float(jnp.sum(w)):.6f}")

# --- 2. spread / gather round trip ------------------------------------------
n, mesh_dims = 64, (16, 16, 16)
cell = jnp.asarray(np.eye(3) * 8.0, jnp.float32)
positions = jnp.asarray(rng.uniform(0, 8.0, (n, 3)), jnp.float32)
charges = jnp.asarray(rng.normal(size=n), jnp.float32)

mesh = spline_spread(positions, charges, cell, mesh_dims)
print("charge conservation: sum(mesh) - sum(q) =",
      float(jnp.sum(mesh) - jnp.sum(charges)))

# gather interpolates a mesh field back to atom positions
values = spline_gather(positions, mesh, cell)
print("gather(spread(q)) sample:", np.round(np.asarray(values[:4]), 4))

# --- 3. adjointness ----------------------------------------------------------
# <spread(q), phi> == <q, gather(phi)> for any mesh field phi — spreading
# and gathering are transposes of one another, which is why PME's
# energy 0.5 q . gather(G * F[spread(q)]) is symmetric and why jax.grad
# through the pipeline equals the analytic ik-space forces.
phi = jnp.asarray(rng.normal(size=mesh_dims), jnp.float32)
lhs = float(jnp.vdot(mesh, phi))
rhs = float(jnp.vdot(charges, spline_gather(positions, phi, cell)))
print(f"adjointness: <spread(q), phi> = {lhs:.6f}   "
      f"<q, gather(phi)> = {rhs:.6f}")

# --- 4. Fourier deconvolution -------------------------------------------------
# Spreading convolves the point charges with the B-spline kernel; PME
# divides the structure factor by |b(k)|^2 (one factor per spread/gather)
# to undo it.  The factors are separable per axis.
deconv = compute_bspline_deconvolution(mesh_dims, spline_order=4)
d = np.asarray(deconv)
print("deconvolution shape:", d.shape,
      " DC term:", float(d[0, 0, 0]),
      " median:", round(float(np.median(d)), 4),
      "(near-Nyquist modes blow up — PME's Green's function is zero there)")
