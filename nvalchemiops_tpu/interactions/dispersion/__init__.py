"""DFT-D3(BJ) dispersion (reference: nvalchemiops/interactions/dispersion)."""

from nvalchemiops_tpu.interactions.dispersion.dftd3 import (  # noqa: F401
    D3Parameters,
    dftd3,
)

__all__ = ["D3Parameters", "dftd3"]
