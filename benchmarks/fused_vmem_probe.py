# SPDX-License-Identifier: Apache-2.0
"""Probe: fused window D3+Coulomb at the composite geometry (VMEM fit).

Round-2 finding: the separated-channel fused window kernel (9 own + 8
j-side pass-2 accumulators) exceeds the 16 MB scoped-VMEM limit at the
109,744-atom composite geometry, so the bench MD step paid two separate
sweeps (31.9 ms where ~27 should be reachable).  ``combine_forces=True``
folds the Coulomb pair forces into the D3 accumulators in-body (6 + 5
outputs).  This probe checks the Mosaic compile at the bench geometry,
force parity vs the separate window calls, and the fused timing.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid, choose_grid_geometry, grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    compact_d3_elements, grid_dftd3, grid_dftd3_coulomb,
)

dtype = jnp.float32
N_REP = int(os.environ.get("PROBE_NREP", "38"))
(pos_np, cell_np, numbers_np, charges_np,
 rcov_np, r4r2_np, cna_np, c6_np) = build_system(n_rep=N_REP)
pos = jnp.asarray(pos_np, dtype)
cell = jnp.asarray(cell_np, dtype)
charges = jnp.asarray(charges_np, dtype)
pbc = np.array([True] * 3)
cutoff, alpha = 9.6, 0.35
numbers, rcov, r4r2, c6, cna = compact_d3_elements(
    numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
rcov, r4r2, c6, cna = (jnp.asarray(a, dtype) for a in (rcov, r4r2, c6, cna))
dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
origin = (jnp.asarray(origin_np, dtype)
          if origin_np is not None and np.asarray(origin_np).any() else None)
n = pos.shape[0]
print(f"N={n} dims={dims} cap={cap}", flush=True)
dep = perturb_positions()

g = build_atom_grid(pos, cell, pbc, dims, radius, cap, origin=origin)

# parity: fused combine_forces vs separate window sweeps
e_d, f_t, cn, e_c, f_none = grid_dftd3_coulomb(
    g, numbers, charges, rcov, r4r2, c6, cna, cutoff, 0.4, 4.2, 1.8,
    alpha=alpha, engine="window", combine_forces=True)
assert f_none is None
e_dr, f_dr, cn_r = grid_dftd3(g, numbers, rcov, r4r2, c6, cna, cutoff,
                              0.4, 4.2, 1.8, engine="window")
e_cr, f_cr = grid_coulomb_energy_forces(g, charges, cutoff, alpha,
                                        engine="window")
scale = float(jnp.abs(f_dr + f_cr).max())
df = float(jnp.abs(f_t - (f_dr + f_cr)).max()) / scale
de = abs(float(e_d) - float(e_dr)) / abs(float(e_dr))
dec = float(jnp.abs(e_c - e_cr).max() / jnp.abs(e_cr).max())
print(f"fused-vs-separate: dE_d3={de:.3e} dE_c={dec:.3e} dF={df:.3e}",
      flush=True)

# timings: fused one-sweep vs the two separate sweeps (both excl. build)
t_nl = measure(lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                         origin=origin), dep, (pos,), iters=4)
print(f"grid build         : {t_nl*1e3:7.2f} ms", flush=True)


def fused(p):
    gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
    return grid_dftd3_coulomb(gg, numbers, charges, rcov, r4r2, c6, cna,
                              cutoff, 0.4, 4.2, 1.8, alpha=alpha,
                              engine="window", combine_forces=True)[:2]


def separate(p):
    gg = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
    e_d3, f_d3, _ = grid_dftd3(gg, numbers, rcov, r4r2, c6, cna, cutoff,
                               0.4, 4.2, 1.8, engine="window")
    e_cc, f_cc = grid_coulomb_energy_forces(gg, charges, cutoff, alpha,
                                            engine="window")
    return e_d3 + jnp.sum(e_cc), f_d3 + f_cc


for name, fn in (("fused window", fused), ("separate sweeps", separate)):
    try:
        t = measure(fn, dep, (pos,), iters=3)
        print(f"{name:18s} : {max(t - t_nl, 0)*1e3:7.2f} ms (excl build)",
              flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{name:18s} : failed {type(exc).__name__}: {exc}"[:300],
              flush=True)
print("done", flush=True)
