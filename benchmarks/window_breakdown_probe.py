# SPDX-License-Identifier: Apache-2.0
"""Stage breakdown + f64 accuracy for the window D3 engine.

Times the window engine's internal stages at the composite scale (via the
``skip_chain`` hook and a bare CN sweep) and measures each engine
variant's force error against the cached f64 CPU reference
(benchmarks/composite_accuracy.py) on the live backend.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from benchmarks.composite_accuracy import build_system  # noqa: E402
from nvalchemiops_tpu.grid import (  # noqa: E402
    _extend_like, build_atom_grid, choose_grid_geometry,
)
from nvalchemiops_tpu.interactions.dispersion.grid_d3 import (  # noqa: E402
    _grid_d3_window_impl, compact_d3_elements, element_c6_mask, grid_dftd3,
)
from nvalchemiops_tpu.grid import scatter_rows_to_grid  # noqa: E402
from nvalchemiops_tpu.types import INDEX_DTYPE  # noqa: E402

N_REP = int(os.environ.get("PROBE_NREP", "38"))


def main():
    dtype = jnp.float32
    pos_np, cell_np, numbers_np, charges_np, rcov_np, r4r2_np, cna_np, c6_np = (
        build_system(n_rep=N_REP)
    )
    n = pos_np.shape[0]
    pos = jnp.asarray(pos_np, dtype)
    cell = jnp.asarray(cell_np, dtype)
    pbc = np.array([True] * 3)
    cutoff = 9.6

    numbers_j, rcov, r4r2, c6, cna = compact_d3_elements(
        numbers_np, rcov_np, r4r2_np, c6_np, cna_np)
    rcov, r4r2, c6, cna = (a.astype(dtype) for a in (rcov, r4r2, c6, cna))
    zmax1 = rcov.shape[0]
    mesh = cna.shape[1]

    dims, radius, cap, origin_np = choose_grid_geometry(pos, cell, pbc, cutoff)
    origin = (jnp.asarray(origin_np, dtype)
              if origin_np is not None and np.asarray(origin_np).any() else None)
    print(f"N={n} dims={dims} cap={cap}", flush=True)
    dep = perturb_positions()

    numbers = jnp.asarray(numbers_j, INDEX_DTYPE)
    mask_elem = element_c6_mask(c6)
    rcov_a = rcov[numbers]
    r4r2_a = r4r2[numbers]
    cna_a = cna[numbers]
    mask_a = mask_elem.astype(dtype)[numbers]
    c6p = jnp.transpose(c6, (0, 2, 1, 3)).reshape(zmax1, mesh, zmax1 * mesh)
    c6p_a = c6p[numbers]

    import functools

    @functools.partial(jax.jit, static_argnames=("stage", "fdt"))
    def run(p, stage, fdt=None):
        g = build_atom_grid(p, cell, pbc, dims, radius, cap, origin=origin)
        zf, rcov_pl, r4r2_pl = scatter_rows_to_grid(
            g, (numbers.astype(dtype), rcov_a, r4r2_a))
        z_pl = zf.astype(INDEX_DTYPE)
        z_ext = _extend_like(g, z_pl, 0)
        rcov_ext = _extend_like(g, rcov_pl, 0.0)
        r4r2_ext = _extend_like(g, r4r2_pl, 0.0)
        if stage == "cn_only":
            # pass 1 alone through the public CN hook is the xla path;
            # approximate with skip_chain minus pass2 cost instead
            raise ValueError
        out = _grid_d3_window_impl(
            g, z_pl, z_ext, rcov_pl, rcov_ext, r4r2_pl, r4r2_ext,
            cna, mask_elem.astype(dtype), c6p,
            cutoff, 0.4, 4.2, 1.8, 1.0, 16.0, -4.0,
            dims, radius, cap, mesh, zmax1,
            jax.default_backend() != "tpu",
            skip_chain=(stage == "p12"),
            feature_dtype=jnp.bfloat16 if fdt == "bf16" else None,
        )
        return out[:4]

    t_build = measure(
        lambda p: build_atom_grid(p, cell, pbc, dims, radius, cap,
                                  origin=origin), dep, (pos,), iters=8)
    print(f"grid build        : {t_build*1e3:8.2f} ms", flush=True)
    for label, stage, fdt in (
        ("p1+feat+p2       ", "p12", None),
        ("p1+feat+p2 bf16  ", "p12", "bf16"),
        ("full             ", "full", None),
    ):
        t = measure(lambda p, s=stage, f=fdt: run(p, s, f), dep, (pos,),
                    iters=3)
        print(f"{label}: {max(t - t_build, 0)*1e3:8.2f} ms (excl build)",
              flush=True)

    # ---- f64 accuracy of the engine variants (small replica) --------------
    from benchmarks import composite_accuracy as ca
    if os.path.exists(ca.REF_PATH):
        ref = np.load(ca.REF_PATH)
        if str(ref.get("version")) == ca.REF_VERSION:
            for label, kw in (
                ("xla f32     ", {}),
                ("xla bf16feat", dict(bilinear="stack",
                                      feature_dtype=jnp.bfloat16)),
                ("window f32  ", dict(engine="window")),
                ("window bf16 ", dict(engine="window",
                                      feature_dtype=jnp.bfloat16)),
                ("block f32   ", dict(engine="block")),
            ):
                err = ca.relative_errors(
                    ca.compute_forces(jnp.float32, d3_kwargs=kw), ref)
                print(f"acc {label}: d3 {err['d3']:.3e}", flush=True)
        else:
            print("ref cache version mismatch; skip accuracy", flush=True)
    else:
        print("no ref cache; skip accuracy", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
