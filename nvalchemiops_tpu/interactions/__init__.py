# SPDX-License-Identifier: Apache-2.0
"""Interaction modules: dispersion (DFT-D3) and electrostatics.

(reference: nvalchemiops/interactions/__init__.py)
"""

from nvalchemiops_tpu.interactions import dispersion  # noqa: F401
from nvalchemiops_tpu.interactions import electrostatics  # noqa: F401

__all__ = ["dispersion", "electrostatics"]
