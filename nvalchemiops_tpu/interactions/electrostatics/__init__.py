# SPDX-License-Identifier: Apache-2.0
"""Electrostatics: Coulomb, Ewald, PME.

(reference: nvalchemiops/interactions/electrostatics/__init__.py:33-80)
"""

from nvalchemiops_tpu.interactions.electrostatics.coulomb import (  # noqa: F401
    coulomb_energy,
    coulomb_energy_forces,
    coulomb_forces,
)
from nvalchemiops_tpu.interactions.electrostatics.parameters import (  # noqa: F401
    EwaldParameters,
    PMEParameters,
    estimate_ewald_parameters,
    estimate_pme_mesh_dimensions,
    estimate_pme_parameters,
    mesh_spacing_to_dimensions,
)
from nvalchemiops_tpu.interactions.electrostatics.k_vectors import (  # noqa: F401
    generate_k_vectors_ewald_summation,
    generate_k_vectors_pme,
)
from nvalchemiops_tpu.interactions.electrostatics.ewald import (  # noqa: F401
    ewald_real_space,
    ewald_reciprocal_space,
    ewald_summation,
)
from nvalchemiops_tpu.interactions.electrostatics.pme import (  # noqa: F401
    batch_pme_reciprocal,
    particle_mesh_ewald,
    grid_particle_mesh_ewald,
    pme_reciprocal_space,
)

from nvalchemiops_tpu.interactions.electrostatics.dense import (  # noqa: F401
    batch_dense_coulomb_energy_forces,
    dense_coulomb_energy_forces,
)

__all__ = [
    "batch_dense_coulomb_energy_forces",
    "dense_coulomb_energy_forces",
    "coulomb_energy",
    "coulomb_forces",
    "coulomb_energy_forces",
    "EwaldParameters",
    "PMEParameters",
    "estimate_ewald_parameters",
    "estimate_pme_mesh_dimensions",
    "estimate_pme_parameters",
    "mesh_spacing_to_dimensions",
    "generate_k_vectors_ewald_summation",
    "generate_k_vectors_pme",
    "ewald_real_space",
    "ewald_reciprocal_space",
    "ewald_summation",
    "particle_mesh_ewald",
    "grid_particle_mesh_ewald",
    "pme_reciprocal_space",
    "batch_pme_reciprocal",
]
