# SPDX-License-Identifier: Apache-2.0
"""Neighbor lists: matrix and COO formats, PBC, dual cutoffs.

(counterpart of the reference's examples/neighborlist gallery)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nvalchemiops_tpu.neighborlist import neighbor_list

rng = np.random.default_rng(0)
cell = jnp.asarray(np.eye(3) * 10.0)
positions = jnp.asarray(rng.uniform(0, 10.0, (256, 3)))
pbc = np.array([True, True, True])

# padded matrix format (recommended: static shapes, jit-friendly)
nm, num, shifts = neighbor_list(positions, 3.0, cell=cell, pbc=pbc)
print("neighbor_matrix:", nm.shape, "mean neighbors:", float(num.mean()))

# COO + CSR format (host-side conversion; dynamic shapes)
nl, ptr, unit_shifts = neighbor_list(
    positions, 3.0, cell=cell, pbc=pbc, return_neighbor_list=True
)
print("pairs:", nl.shape[1], "ptr:", ptr.shape)

# dual cutoff: one pass, two radii (MLIP short/long pattern)
out = neighbor_list(positions, 2.0, cutoff2=4.0, cell=cell, pbc=pbc)
nm1, num1, sh1, nm2, num2, sh2 = out
print("dual cutoffs:", float(num1.mean()), float(num2.mean()))

# batched systems
batch_idx = jnp.asarray(np.repeat([0, 1], 128).astype(np.int32))
cells = jnp.asarray(np.stack([np.eye(3) * 10.0, np.eye(3) * 12.0]))
nm_b, num_b, sh_b = neighbor_list(
    positions, 3.0, cell=cells, pbc=np.tile(pbc, (2, 1)), batch_idx=batch_idx
)
print("batched:", nm_b.shape)
