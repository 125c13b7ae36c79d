# SPDX-License-Identifier: Apache-2.0
"""DFT-D3(BJ) dispersion (reference: nvalchemiops/interactions/dispersion)."""

from nvalchemiops_tpu.interactions.dispersion.dftd3 import (  # noqa: F401
    D3Parameters,
    dftd3,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: F401
    batch_grid_dftd3,
    compact_d3_elements,
    element_c6_mask,
    element_cn_ref,
    grid_dftd3,
    grid_dftd3_coulomb,
)
from nvalchemiops_tpu.interactions.dispersion.dense_d3 import (  # noqa: F401
    batch_dense_dftd3,
    batch_dftd3,
    dense_dftd3,
)

__all__ = [
    "D3Parameters",
    "batch_dense_dftd3",
    "batch_dftd3",
    "batch_grid_dftd3",
    "compact_d3_elements",
    "dense_dftd3",
    "dftd3",
    "element_c6_mask",
    "element_cn_ref",
    "grid_dftd3",
    "grid_dftd3_coulomb",
]
