# SPDX-License-Identifier: Apache-2.0
"""Largest reference NL points: 64 x 131k batch cell list + 1M single build.

Round-3 VERDICT missing #3: the reference's largest batch-NL benchmark is
batch cell list at 64 x 131,072 = 8.39M atoms (H100: 300.2 ms, 33.2 GB,
BASELINE.md:19) and its 1,048,576-atom single-system cell-list row FAILED
on the H100 (BASELINE.md:18) — no TPU counterpart existed.  This probe
measures both:

- batch-cell-list: 64 simple-cubic systems of 51^3 = 132,651 atoms
  (8.49M total, slightly above the reference point), a = 3.0, cutoff 4.5
  (the suite's NL config) -> padded neighbor matrices, the same output
  contract as the reference's batch_cell_list.
- single 1M: grid build + cell-list matrix query at 102^3 = 1,061,208
  atoms (the point the H100 could not complete).

Writes rows for benchmarks/results/neighborlist_benchmark_batch CSV.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal, write_csv  # noqa: E402

CUTOFF = 4.5
A = 3.0
rows = []
dep = perturb_positions()

# ---- single-system 1M-atom build (H100 failed here) -----------------------
n_rep = int(os.environ.get("PROBE_1M_NREP", "102"))
pos_np, cell_np = crystal(n_rep, A)
n1 = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(cell_np, jnp.float32)
pbc = np.array([True] * 3)

from nvalchemiops_tpu.grid import build_atom_grid, choose_grid_geometry

dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, CUTOFF)
origin = (jnp.asarray(origin_np, jnp.float32)
          if origin_np is not None else None)
print(f"1M single: N={n1} dims={dims} cap={cap}", flush=True)
t = measure(
    lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                              origin=origin).ext_px,
    dep, (pos,), iters=6)
print(f"grid-build 1M: {t*1e3:.3f} ms ({t*1e6/n1:.4f} us/atom)", flush=True)
rows.append(["grid-build", n1, 1, round(t * 1e3, 4), round(t * 1e6 / n1, 4)])

# cell-list padded neighbor-matrix build at 1M (API-parity output
# contract).  The public cell_list() wrapper does host-side
# estimate-then-check (device_get) and cannot run inside the chained
# timing loop; time the jitted build+query core with the static sizes
# precomputed once — the same split an MD loop uses (reference
# cell_list.py:639-724 isolates its sizes identically).
from nvalchemiops_tpu.neighborlist.cell_list import (
    build_cell_list, estimate_cell_list_sizes, query_cell_list,
)

try:
    if os.environ.get("PROBE_CELLLIST", "0") != "1":
        raise RuntimeError(
            "skipped (PROBE_CELLLIST=1 to enable): the 1M-atom padded "
            "matrix query crashed the TPU worker (round 4); the halo "
            "grid build above is the at-scale neighbor structure")
    max_total_cells, radius_cl = estimate_cell_list_sizes(
        cell, pbc, CUTOFF, 400_000)
    radius_t = tuple(int(v) for v in np.asarray(radius_cl))
    cl0 = build_cell_list(pos, CUTOFF, cell, pbc, max_total_cells, 400_000)
    cl_cap = int(np.ceil(int(jnp.max(cl0.atoms_per_cell_count)) / 8)) * 8

    def cl_step(p):
        cl = build_cell_list(p, CUTOFF, cell, pbc, max_total_cells,
                             400_000)
        nm, num, sh = query_cell_list(p, CUTOFF, cell, pbc, cl, radius_t,
                                      cl_cap, 24, shift_format="packed")
        return num

    t = measure(cl_step, dep, (pos,), iters=4)
    print(f"cell-list 1M: {t*1e3:.3f} ms ({t*1e6/n1:.4f} us/atom)",
          flush=True)
    rows.append(["cell-list", n1, 1, round(t * 1e3, 4),
                 round(t * 1e6 / n1, 4)])
except Exception as exc:  # noqa: BLE001
    print(f"cell-list 1M FAILED: {type(exc).__name__}: {exc}"[:300],
          flush=True)

# ---- batch cell list at 64 x 132,651 = 8.49M atoms ------------------------
B = int(os.environ.get("PROBE_BATCH_B", "64"))
nr = int(os.environ.get("PROBE_BATCH_NREP", "51"))
pos1, cell1 = crystal(nr, A)
npa = pos1.shape[0]
rng = np.random.default_rng(0)
pos_b_np = np.stack([
    pos1 + rng.uniform(-0.2, 0.2, pos1.shape) for _ in range(B)
]).reshape(B * npa, 3)
pos_b = jnp.asarray(pos_b_np, jnp.float32)
cells_b = jnp.asarray(np.tile(cell1, (B, 1, 1)), jnp.float32)
batch_idx = jnp.asarray(np.repeat(np.arange(B), npa), jnp.int32)
batch_ptr = jnp.asarray(np.arange(B + 1) * npa, jnp.int32)
print(f"batch: B={B} npa={npa} total={B*npa}", flush=True)

from nvalchemiops_tpu.neighborlist.batch_cell_list import (
    batch_build_cell_list,
    batch_query_cell_list,
    estimate_batch_cell_list_sizes,
)

try:
    stride, max_total_cells_b, radius_b = estimate_batch_cell_list_sizes(
        cells_b, np.array([True] * 3), CUTOFF, 50_000)
    radius_bt = tuple(int(v) for v in np.asarray(radius_b).max(axis=0))
    clb0 = batch_build_cell_list(pos_b, CUTOFF, cells_b,
                                 np.array([True] * 3), batch_idx, stride,
                                 50_000)
    cap_b = int(np.ceil(int(jnp.max(clb0.atoms_per_cell_count)) / 8)) * 8

    def bcl_build_step(p):
        cl = batch_build_cell_list(p, CUTOFF, cells_b,
                                   np.array([True] * 3), batch_idx, stride,
                                   50_000)
        return cl.cell_atom_list

    t = measure(bcl_build_step, dep, (pos_b,), iters=3)
    print(f"batch-cell-list-build {B}x{npa}: {t*1e3:.3f} ms", flush=True)
    rows.append(["batch-cell-list-build", B * npa, B, round(t * 1e3, 4),
                 round(t * 1e6 / (B * npa), 4)])

    def bcl_step(p):
        cl = batch_build_cell_list(p, CUTOFF, cells_b,
                                   np.array([True] * 3), batch_idx, stride,
                                   50_000)
        nm, num, sh = batch_query_cell_list(
            p, CUTOFF, cells_b, np.array([True] * 3), batch_idx, cl,
            stride, radius_bt, cap_b, 24, shift_format="packed")
        return num

    t = measure(bcl_step, dep, (pos_b,), iters=3)
    print(f"batch-cell-list {B}x{npa}: {t*1e3:.3f} ms "
          f"({t*1e6/(B*npa):.4f} us/atom)", flush=True)
    rows.append(["batch-cell-list", B * npa, B, round(t * 1e3, 4),
                 round(t * 1e6 / (B * npa), 4)])
except Exception as exc:  # noqa: BLE001
    print(f"batch-cell-list FAILED: {type(exc).__name__}: {exc}"[:300],
          flush=True)

# TPU-native batched neighbor structure: the fused whole-batch build (one
# global compound-key sort + cap x monotone 1-D takes; the vmapped
# per-system build measured 556-929 ms at this config, r5_batchnl_probe)
try:
    from nvalchemiops_tpu.grid import (
        batch_build_atom_grid, estimate_grid_geometry,
    )

    dims_g, radius_g, cap_g = estimate_grid_geometry(
        cell1, np.array([True] * 3), CUTOFF, npa, target_occupancy=0.6)
    pos_bs = jnp.asarray(pos_b_np.reshape(B, npa, 3), jnp.float32)
    cell_j = jnp.asarray(cell1, jnp.float32)
    # tight capacity from the observed batch-wide max occupancy (the
    # Poisson-margin estimate carries ~2x slack; sweep cost ~ cap)
    g0 = batch_build_atom_grid(pos_bs[:2], cell_j, np.array([True] * 3),
                               dims_g, radius_g, cap_g)
    occ_b = int(jnp.max(g0.counts_max))
    cap_g = int(np.ceil(max(occ_b, 1) / 8)) * 8
    del g0
    print(f"batch grid: dims={dims_g} cap={cap_g} (occ {occ_b})",
          flush=True)

    def bgrid_step(p):
        g = batch_build_atom_grid(p, cell_j, np.array([True] * 3),
                                  dims_g, radius_g, cap_g)
        return g.ext_px

    t = measure(bgrid_step, dep, (pos_bs,), iters=3)
    print(f"batch-grid-build {B}x{npa}: {t*1e3:.3f} ms "
          f"({t*1e6/(B*npa):.4f} us/atom)", flush=True)
    rows.append(["batch-grid-build", B * npa, B, round(t * 1e3, 4),
                 round(t * 1e6 / (B * npa), 4)])
except Exception as exc:  # noqa: BLE001
    print(f"batch-grid-build FAILED: {type(exc).__name__}: {exc}"[:300],
          flush=True)

write_csv("benchmarks/results/neighborlist_batch_benchmark_tpu-chip.csv",
          rows, ["method", "atoms", "systems", "time_ms", "us_per_atom"])
print("done", flush=True)
