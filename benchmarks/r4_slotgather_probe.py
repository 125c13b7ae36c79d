# SPDX-License-Identifier: Apache-2.0
"""A/B probe: slot-plane gather vs scatter at the headline bench config.

Round-3 VERDICT weak #3: the headline regressed 6% (PME E+F 9.4-10.4 ->
11.95 ms, NL build 2.4 -> 2.76) with no explanation.  The suspects are
the round-3 slot-plane heuristic changes (use_slot_gather /
_use_slot_gather, commits 159081d + daab7fa): the gather form was proven
at 524k/1.34x slack but never measured at the 110k bench config, where
the heuristic now also selects it.

Run TWICE (the knob is trace-time, one jit cache per process):

    NVALCHEMIOPS_SLOT_GATHER=0 python benchmarks/r4_slotgather_probe.py
    NVALCHEMIOPS_SLOT_GATHER=1 python benchmarks/r4_slotgather_probe.py

Measures exactly the bench.py stages: grid build, D3 window, PME E+F.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid, choose_grid_geometry,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements, grid_dftd3,
)
from nvalchemiops_tpu.interactions.electrostatics.pme import (  # noqa: E402
    _pme_reciprocal_impl,
)
from nvalchemiops_tpu.spline_windowed import observed_tile_capacity  # noqa: E402

mode = os.environ.get("NVALCHEMIOPS_SLOT_GATHER", "<heuristic>")
n_rep = int(os.environ.get("PROBE_NREP", "38"))
dtype = jnp.float32
(pos_np, cell_np, numbers_np, charges_np,
 rcov_np, r4r2_np, cna_np, c6_np) = build_system(n_rep=n_rep)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, dtype)
cell = jnp.asarray(cell_np, dtype)
charges = jnp.asarray(charges_np, dtype)
pbc = np.array([True] * 3)
cutoff = 9.6
alpha = 0.35
mesh = (128, 128, 128) if n_rep >= 24 else (32, 32, 32)
numbers, rcov, r4r2, c6, cna = compact_d3_elements(
    numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
rcov, r4r2, c6, cna = (a.astype(dtype) for a in (rcov, r4r2, c6, cna))
dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
origin = (jnp.asarray(origin_np, dtype)
          if origin_np is not None and np.asarray(origin_np).any() else None)
print(f"slot_gather={mode} N={n} dims={dims} cap={cap}", flush=True)
dep = perturb_positions()

t_nl = measure(
    lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin),
    dep, (pos,), iters=8)
print(f"nl_build: {t_nl*1e3:8.3f} ms", flush=True)


def d3_step(p):
    gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
    return grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                      0.4, 4.2, 1.8, engine="window")


t_d3 = measure(d3_step, dep, (pos,), iters=3)
print(f"d3_total: {t_d3*1e3:8.3f} ms (incl build; d3 only "
      f"{(t_d3-t_nl)*1e3:.3f})", flush=True)

tile_cap = observed_tile_capacity(pos, cell, mesh)


def pme_step(p):
    e, forces, _ = _pme_reciprocal_impl(
        p, charges, cell.reshape(1, 3, 3), jnp.asarray([alpha], dtype),
        mesh, 4, None, True, False, None, None, tile_capacity=tile_cap)
    return e, forces


t_pme = measure(pme_step, dep, (pos,), iters=3)
print(f"pme_EF:   {t_pme*1e3:8.3f} ms (tile_cap={tile_cap})", flush=True)
print("done", flush=True)
