# SPDX-License-Identifier: Apache-2.0
"""NVE velocity-Verlet energy conservation over the analytic force kernels.

End-to-end invariant on the MD-loop story (reference examples/neighborlist/
03_rebuild_neighborlist_detection.py is the workflow; SURVEY.md §3.5): if
the analytic forces are exactly -dE/dx and every term is smooth at the
cutoff (S5-switched D3, erfc-damped Coulomb with alpha large enough that
the truncated tail is negligible), a symplectic integrator must conserve
total energy to O(dt^2) *through neighbor-list rebuilds*.  This catches
force/energy inconsistencies that pointwise finite-difference tests miss
(wrong shift handling on crossings, asymmetric pair accounting, switching
windows applied to E but not F).
"""

import numpy as np
import jax
import jax.numpy as jnp

from nvalchemiops_tpu.interactions.dispersion import dftd3
from nvalchemiops_tpu.interactions.electrostatics import (
    dense_coulomb_energy_forces,
)
from nvalchemiops_tpu.neighborlist import naive_neighbor_list

from tests.interactions.dispersion.test_dftd3 import element_tables, ZMAX

A1, A2, S8 = 0.40, 4.6, 1.7
CUTOFF = 4.5
S5_ON, S5_OFF = 3.3, 4.5
ALPHA = 1.3  # erfc(1.3 * 4.5) ~ 7e-17: the truncated Coulomb tail is zero


def _system(n_side=4, box=10.0, seed=3):
    rng = np.random.default_rng(seed)
    grid = np.stack(
        np.meshgrid(*([np.arange(n_side)] * 3), indexing="ij"), -1
    ).reshape(-1, 3) * (box / n_side)
    pos = grid + rng.uniform(-0.3, 0.3, grid.shape)
    n = pos.shape[0]
    numbers = rng.integers(1, ZMAX + 1, n)
    charges = rng.normal(size=n) * 0.2
    charges -= charges.mean()
    vel = rng.normal(size=(n, 3)) * 0.05
    vel -= vel.mean(axis=0)
    cell = np.eye(3) * box
    return pos, numbers, charges, vel, cell


def _energy_forces(pos, numbers, charges, cell, params):
    """Total PE and analytic forces: S5-switched D3 + damped dense Coulomb."""
    nm, num, sh = naive_neighbor_list(
        pos, CUTOFF, cell=cell, pbc=np.array([True] * 3)
    )
    e_d3, f_d3, _cn = dftd3(
        pos, jnp.asarray(numbers, jnp.int32), A1, A2, S8,
        s5_smoothing_on=S5_ON, s5_smoothing_off=S5_OFF,
        d3_params=params, cell=cell,
        neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        output_dtype=pos.dtype,
    )
    e_c, f_c = dense_coulomb_energy_forces(pos, charges, cell, CUTOFF, ALPHA)
    return jnp.sum(e_d3) + jnp.sum(e_c), f_d3 + f_c


def test_nve_velocity_verlet_conserves_energy():
    dtype = jnp.float64
    pos_np, numbers, charges_np, vel_np, cell_np = _system()
    params = element_tables()
    pos = jnp.asarray(pos_np, dtype)
    vel = jnp.asarray(vel_np, dtype)
    charges = jnp.asarray(charges_np, dtype)
    cell = jnp.asarray(cell_np, dtype)

    dt = 2e-3
    pe, forces = _energy_forces(pos, numbers, charges, cell, params)
    ke = 0.5 * jnp.sum(vel * vel)
    e0 = float(pe + ke)

    energies = [e0]
    for _ in range(150):
        vel = vel + 0.5 * dt * forces  # unit masses
        pos = pos + dt * vel
        pe, forces = _energy_forces(pos, numbers, charges, cell, params)
        vel = vel + 0.5 * dt * forces
        ke = 0.5 * jnp.sum(vel * vel)
        energies.append(float(pe + ke))

    energies = np.asarray(energies)
    # forces must stay equal-and-opposite through every rebuild
    assert float(jnp.max(jnp.abs(jnp.sum(forces, axis=0)))) < 1e-9

    scale = max(abs(e0), float(ke))
    drift = np.max(np.abs(energies - e0))
    # O(dt^2) Verlet fluctuation; a force/energy inconsistency at the
    # cutoff or a shift-handling bug shows up orders of magnitude larger
    assert drift < 5e-4 * scale, (drift, scale, energies[-1] - e0)


def test_nve_hot_dynamics_conserves_through_cutoff_crossings():
    """Hot run: atoms move ~0.5 A, so pairs genuinely cross the cutoff.

    A cutoff-crossing inconsistency (e.g. the S5 window applied to the
    energy but not the forces, or a stale shift after a rebuild) produces
    O(pair-energy-at-crossing) jumps; with the smooth window the total
    energy must stay flat at the integrator level.
    """
    dtype = jnp.float64
    pos_np, numbers, charges_np, vel_np, cell_np = _system(seed=11)
    params = element_tables()
    charges = jnp.asarray(charges_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pos = jnp.asarray(pos_np, dtype)
    vel = jnp.asarray(vel_np, dtype) * 20.0  # ~1 A / time-unit RMS

    dt = 1e-3
    pe, forces = _energy_forces(pos, numbers, charges, cell, params)
    e0 = float(pe + 0.5 * jnp.sum(vel * vel))
    start = np.asarray(pos)

    worst = 0.0
    for _ in range(300):
        vel = vel + 0.5 * dt * forces
        pos = pos + dt * vel
        pe, forces = _energy_forces(pos, numbers, charges, cell, params)
        vel = vel + 0.5 * dt * forces
        worst = max(worst, abs(float(pe + 0.5 * jnp.sum(vel * vel)) - e0))

    # the run must have produced real motion (else the test proves nothing)
    motion = np.max(np.linalg.norm(np.asarray(pos) - start, axis=1))
    assert motion > 0.2, motion
    scale = max(abs(e0), 1.0)
    assert worst < 1e-4 * scale, (worst, scale)
