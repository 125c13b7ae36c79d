# SPDX-License-Identifier: Apache-2.0
"""Single-system D3 scale-curve decomposition (round-4 VERDICT weak #4).

Suite per-atom rate degrades 2.1x from 4k to 512k (0.136 -> 0.281
us/atom incl build) while the H100 improves with size.  Decompose the
suite config (simple-cubic a=3.0, zmax 16, 9.0 A) at 97k vs 512k:
build / passes 1+2 (skip_chain) / full, so the growth can be pinned to
the build, the MXU pass, or the chain pass, and the chosen geometry
(dims/cap/x-block) is printed for both sizes.

Usage: nohup python benchmarks/r5_scale_curve_probe.py > log 2>&1 &
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.run_benchmarks import crystal, tuned_grid  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    _extend_like, build_atom_grid, scatter_rows_to_grid,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    _grid_d3_window_impl, element_c6_mask,
)
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402

CUTOFF = 9.0
ZMAX = 16
dtype = jnp.float32
dep = perturb_positions()

rng = np.random.default_rng(1)
rcov = jnp.asarray(np.r_[0, rng.uniform(0.6, 1.2, ZMAX)], dtype)
r4r2 = jnp.asarray(np.r_[0, rng.uniform(2, 5, ZMAX)], dtype)
cna = jnp.asarray(
    np.vstack([np.zeros(5), np.cumsum(rng.uniform(0.3, 1, (ZMAX, 5)), 1)]),
    dtype)
c6_np = rng.uniform(5, 40, (ZMAX + 1, ZMAX + 1, 5, 5))
c6_np[0] = 0
c6_np[:, 0] = 0
c6_np = 0.5 * (c6_np + np.swapaxes(np.swapaxes(c6_np, 0, 1), 2, 3))
c6 = jnp.asarray(c6_np, dtype)
zmax1 = ZMAX + 1
mesh = 5
mask_elem = element_c6_mask(c6)
c6p = jnp.transpose(c6, (0, 2, 1, 3)).reshape(zmax1, mesh, zmax1 * mesh)

warmed = [False]

for n_rep in (int(s) for s in os.environ.get("PROBE_SIZES",
                                             "46,80").split(",")):
    pos_np, cell_np = crystal(n_rep, 3.0)
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pbc = np.array([True] * 3)
    numbers = jnp.asarray(rng.integers(1, ZMAX + 1, n), INDEX_DTYPE)
    dims, radius, cap, origin = tuned_grid(pos, cell, pbc, CUTOFF, n)
    from nvalchemiops_tpu.pallas.window_sweep import (
        window_lane_width, window_x_block,
    )
    lane_w = window_lane_width(cap, radius[2])
    bx = window_x_block(dims[2], lane_w)
    print(f"[n={n}] dims={dims} cap={cap} lane_w={lane_w} bx={bx}",
          flush=True)
    rcov_a = rcov[numbers]
    r4r2_a = r4r2[numbers]

    @functools.partial(jax.jit, static_argnames=("stage",))
    def run(p, stage, _cell=cell, _dims=dims, _radius=radius, _cap=cap,
            _origin=origin, _numbers=numbers, _rcov_a=rcov_a,
            _r4r2_a=r4r2_a):
        g = build_atom_grid(p, _cell, pbc, _dims, _radius, _cap,
                            origin=_origin)
        zf, rcov_pl, r4r2_pl = scatter_rows_to_grid(
            g, (_numbers.astype(dtype), _rcov_a, _r4r2_a))
        z_pl = zf.astype(INDEX_DTYPE)
        out = _grid_d3_window_impl(
            g, z_pl, _extend_like(g, z_pl, 0),
            rcov_pl, _extend_like(g, rcov_pl, 0.0),
            r4r2_pl, _extend_like(g, r4r2_pl, 0.0),
            cna, mask_elem.astype(dtype), c6p,
            CUTOFF, 0.4, 4.2, 1.8, 1.0, 16.0, -4.0,
            _dims, _radius, _cap, mesh, zmax1,
            jax.default_backend() != "tpu",
            skip_chain=(stage == "p12"))
        return out[:4]

    def build_step(p, _cell=cell, _dims=dims, _radius=radius, _cap=cap,
                   _origin=origin):
        return build_atom_grid(p, _cell, pbc, _dims, _radius, _cap,
                               origin=_origin).ext_px

    if not warmed[0]:
        measure(build_step, dep, (pos,), iters=4)
        warmed[0] = True
    t_b = measure(build_step, dep, (pos,), iters=4)
    t_p12 = measure(lambda p: run(p, "p12"), dep, (pos,), iters=3)
    t_full = measure(lambda p: run(p, "full"), dep, (pos,), iters=3)
    print(f"[n={n}] build {t_b*1e3:.2f} | p1+feat+p2 "
          f"{(t_p12-t_b)*1e3:.2f} | pass3 {(t_full-t_p12)*1e3:.2f} | "
          f"full-excl-build {(t_full-t_b)*1e3:.2f} ms "
          f"({(t_full-t_b)*1e6/n:.3f} us/atom excl build; "
          f"{t_full*1e6/n:.3f} incl)", flush=True)

print("done", flush=True)
