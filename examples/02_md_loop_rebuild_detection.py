# SPDX-License-Identifier: Apache-2.0
"""MD-loop cached cell list with rebuild detection.

(counterpart of reference examples/neighborlist/03_rebuild_neighborlist_detection.py)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from nvalchemiops_tpu.neighborlist import (
    build_cell_list,
    check_cell_list_rebuild_needed,
    check_neighbor_list_rebuild_needed,
    estimate_cell_list_sizes,
    query_cell_list,
)

rng = np.random.default_rng(0)
cell = jnp.asarray(np.eye(3) * 15.0)
pbc = np.array([True] * 3)
positions = jnp.asarray(rng.uniform(0, 15.0, (500, 3)))
cutoff, skin = 3.0, 0.5

max_cells, radius = estimate_cell_list_sizes(cell, pbc, cutoff + skin)
radius_t = tuple(int(v) for v in np.asarray(radius))
cl = build_cell_list(positions, cutoff + skin, cell, pbc, max_cells)
ref_positions = positions
rebuilds = 0

for step in range(20):
    # fake dynamics
    positions = positions + jnp.asarray(rng.normal(0, 0.03, positions.shape))
    # the skin-distance criterion decides; the cell-crossing check is also
    # available for cached-bin invalidation (stricter: any crossing fires)
    crossed = check_cell_list_rebuild_needed(
        cl.cells_per_dimension, cl.neighbor_search_radius,
        cl.atom_periodic_shifts, cl.atom_to_cell_mapping,
        cl.atoms_per_cell_count, cl.cell_atom_start_indices,
        cl.cell_atom_list, positions, cell, pbc, cutoff + skin)
    if check_neighbor_list_rebuild_needed(ref_positions, positions, skin / 2):
        cl = build_cell_list(positions, cutoff + skin, cell, pbc, max_cells)
        ref_positions = positions
        rebuilds += 1
    nm, num, sh = query_cell_list(
        positions, cutoff, cell, pbc, cl, radius_t, 32, 64,
        fill_value=positions.shape[0],
    )

print(f"20 steps, {rebuilds} rebuilds, mean neighbors {float(num.mean()):.1f}")
