# SPDX-License-Identifier: Apache-2.0
"""DFT-D3(BJ) dispersion + full electrostatics on a small crystal."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nvalchemiops_tpu.neighborlist import neighbor_list
from nvalchemiops_tpu.interactions.dispersion import D3Parameters, dftd3
from nvalchemiops_tpu.interactions.electrostatics import (
    estimate_ewald_parameters,
    ewald_summation,
    particle_mesh_ewald,
)

rng = np.random.default_rng(0)
zmax = 4

# rocksalt-like toy crystal
base = np.array([[0, 0, 0], [.5, .5, 0], [.5, 0, .5], [0, .5, .5],
                 [.5, 0, 0], [0, .5, 0], [0, 0, .5], [.5, .5, .5]])
a = 4.0
positions = jnp.asarray(np.concatenate([(base + s) * a / 2 for s in
                                        np.ndindex(2, 2, 2)]))
n = positions.shape[0]
cell = jnp.asarray(np.eye(3) * (2 * a))
pbc = np.array([True] * 3)
numbers = jnp.asarray(rng.integers(1, zmax + 1, n), jnp.int32)
charges = jnp.asarray(np.tile([1.0] * 4 + [-1.0] * 4, n // 8))

nm, num, sh = neighbor_list(positions, 3.9, cell=cell, pbc=pbc)

# --- DFT-D3 with toy element tables -----------------------------------------
params = D3Parameters(
    rcov=np.r_[0, rng.uniform(0.6, 1.2, zmax)],
    r4r2=np.r_[0, rng.uniform(2, 5, zmax)],
    c6ab=rng.uniform(5, 30, (zmax + 1, zmax + 1, 5, 5)),
    cn_ref=np.cumsum(rng.uniform(.3, 1, (zmax + 1, zmax + 1, 5, 5)), axis=2),
)
energy, forces, cn = dftd3(
    positions, numbers, a1=0.40, a2=4.2, s8=1.85, d3_params=params,
    cell=cell, neighbor_matrix=nm, neighbor_matrix_shifts=sh,
)
print("D3 energy:", float(energy.sum()), " max|F|:", float(jnp.abs(forces).max()))

# --- Ewald summation with autotuned parameters -------------------------------
p = estimate_ewald_parameters(positions, cell, accuracy=1e-6)
nm_e, num_e, sh_e = neighbor_list(positions, float(p.real_space_cutoff[0]),
                                  cell=cell, pbc=pbc, max_neighbors=512)
e_ewald, f_ewald = ewald_summation(
    positions, charges, cell, neighbor_matrix=nm_e, neighbor_matrix_shifts=sh_e,
    compute_forces=True, accuracy=1e-6,
)
print("Ewald total:", float(e_ewald.sum()))

# --- PME (same physics, FFT-based reciprocal space) --------------------------
e_pme = particle_mesh_ewald(
    positions, charges, cell, alpha=float(p.alpha[0]),
    mesh_dimensions=(32, 32, 32),
    neighbor_matrix=nm_e, neighbor_matrix_shifts=sh_e,
)
print("PME total:", float(e_pme.sum()), "(should match Ewald)")
