# SPDX-License-Identifier: Apache-2.0
"""Pallas TPU kernels — the hand-scheduled native layer.

Counterpart of the reference's Warp kernel layer (SURVEY.md §1 L3): where
XLA's automatic scheduling leaves bandwidth on the table, these kernels pin
the working set in VMEM and drive the MXU directly.  Currently:

- :mod:`~nvalchemiops_tpu.pallas.spread` — PME separable B-spline
  spread/gather with the mesh resident in VMEM across the whole atom sweep
  (the XLA version round-trips the [chunk, ny*nz] outer-product intermediate
  through HBM every chunk).
"""

from nvalchemiops_tpu.pallas.spread import (  # noqa: F401
    pallas_separable_gather,
    pallas_separable_spread,
)

__all__ = ["pallas_separable_spread", "pallas_separable_gather"]
