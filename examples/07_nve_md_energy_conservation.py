# SPDX-License-Identifier: Apache-2.0
"""NVE molecular dynamics with analytic forces: energy conservation.

Velocity-Verlet on S5-switched DFT-D3(BJ) dispersion + erfc-damped
real-space Coulomb, with the neighbor list rebuilt every step (the
padded-matrix path; see examples/02 for cached rebuild detection).
Because every force kernel is the exact analytic gradient of its energy
and both terms are smooth at the cutoff, total energy is flat at the
integrator level — the end-to-end invariant tested in
tests/test_md_conservation.py.

Reference counterpart: the MD-loop workflow of
examples/neighborlist/03_rebuild_neighborlist_detection.py (the reference
has no integrator example; this one exercises the same API surface).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nvalchemiops_tpu.interactions.dispersion import D3Parameters, dftd3
from nvalchemiops_tpu.interactions.electrostatics import (
    dense_coulomb_energy_forces,
)
from nvalchemiops_tpu.neighborlist import naive_neighbor_list

rng = np.random.default_rng(0)
n_side, box = 4, 10.0
CUTOFF, ALPHA = 4.5, 1.3
ZMAX = 5

grid = np.stack(
    np.meshgrid(*([np.arange(n_side)] * 3), indexing="ij"), -1
).reshape(-1, 3) * (box / n_side)
pos = jnp.asarray(grid + rng.uniform(-0.3, 0.3, grid.shape))
n = pos.shape[0]
numbers = jnp.asarray(rng.integers(1, ZMAX + 1, n), jnp.int32)
charges = jnp.asarray(rng.normal(size=n) * 0.2)
charges = charges - charges.mean()
vel = jnp.asarray(rng.normal(size=(n, 3)) * 0.3)
vel = vel - vel.mean(axis=0)
cell = jnp.asarray(np.eye(3) * box)

# deliberately non-physical but numerically stable element tables
rcov = np.r_[0.0, rng.uniform(0.6, 1.4, ZMAX)]
r4r2 = np.r_[0.0, rng.uniform(2.0, 6.0, ZMAX)]
c6 = rng.uniform(5.0, 40.0, (ZMAX + 1, ZMAX + 1, 5, 5))
c6[0] = 0.0
c6[:, 0] = 0.0
c6 = 0.5 * (c6 + np.swapaxes(np.swapaxes(c6, 0, 1), 2, 3))
cn_ref = np.broadcast_to(
    np.cumsum(rng.uniform(0.3, 1.0, (ZMAX + 1, 5)), 1)[:, None, :, None],
    c6.shape,
).copy()
params = D3Parameters(rcov=rcov, r4r2=r4r2, c6ab=c6, cn_ref=cn_ref)


def energy_forces(p):
    nm, _num, sh = naive_neighbor_list(
        p, CUTOFF, cell=cell, pbc=np.array([True] * 3)
    )
    e_d3, f_d3, _cn = dftd3(
        p, numbers, 0.4, 4.6, 1.7,
        s5_smoothing_on=3.3, s5_smoothing_off=CUTOFF,
        d3_params=params, cell=cell,
        neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        output_dtype=p.dtype,
    )
    e_c, f_c = dense_coulomb_energy_forces(p, charges, cell, CUTOFF, ALPHA)
    return jnp.sum(e_d3) + jnp.sum(e_c), f_d3 + f_c


dt = 2e-3
pe, forces = energy_forces(pos)
e0 = float(pe + 0.5 * jnp.sum(vel * vel))
print(f"step {0:4d}  E_total = {e0:+.8f}")

for step in range(1, 201):
    vel = vel + 0.5 * dt * forces
    pos = pos + dt * vel
    pe, forces = energy_forces(pos)
    vel = vel + 0.5 * dt * forces
    if step % 50 == 0:
        e = float(pe + 0.5 * jnp.sum(vel * vel))
        print(f"step {step:4d}  E_total = {e:+.8f}  drift = {e - e0:+.2e}")

print("total energy conserved to the integrator level (O(dt^2))")
