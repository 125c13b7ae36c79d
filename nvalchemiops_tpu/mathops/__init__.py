# SPDX-License-Identifier: Apache-2.0
"""Math building blocks shared by the kernel modules.

TPU-native counterpart of ``nvalchemiops/math`` (reference: math/math.py,
math/spherical_harmonics.py, math/gto.py).  The Warp device functions become
plain jnp functions — usable both in traced XLA code and inside Pallas kernel
bodies (which accept jnp expressions directly).
"""

from nvalchemiops_tpu.mathops.math import (  # noqa: F401
    apply_mat3,
    divmod_floor,
    dot_phases,
    erfc_approx,
    exp_over_x,
    safe_divide,
    sinc_normalized,
)
from nvalchemiops_tpu.mathops.spherical_harmonics import (  # noqa: F401
    eval_all_spherical_harmonics,
    eval_spherical_harmonics_l0,
    eval_spherical_harmonics_l1,
    eval_spherical_harmonics_l2,
    spherical_harmonics,
    spherical_harmonics_gradient,
)
from nvalchemiops_tpu.mathops.gto import (  # noqa: F401
    eval_gto_density,
    eval_gto_fourier,
    gto_normalization,
    gto_self_overlap,
)

__all__ = [
    "apply_mat3",
    "divmod_floor",
    "dot_phases",
    "erfc_approx",
    "exp_over_x",
    "safe_divide",
    "sinc_normalized",
    "spherical_harmonics",
    "spherical_harmonics_gradient",
    "eval_all_spherical_harmonics",
    "eval_spherical_harmonics_l0",
    "eval_spherical_harmonics_l1",
    "eval_spherical_harmonics_l2",
    "eval_gto_density",
    "eval_gto_fourier",
    "gto_normalization",
    "gto_self_overlap",
]
