# SPDX-License-Identifier: Apache-2.0
"""On-chip numerical accuracy audit: TPU f32 results vs CPU f64 references.

TPU lowers f32 matmuls (even [N,3]@[3,3] coordinate transforms and
[N,K] phase matmuls) to single-bf16-pass MXU ops; this probe quantifies
the end-to-end effect per kernel.  Two-phase:

    python benchmarks/accuracy_probe.py ref   # CPU, x64 -> /tmp/acc_ref.npz
    python benchmarks/accuracy_probe.py tpu   # chip f32 vs the reference
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"

import jax  # noqa: E402

if mode == "ref":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nvalchemiops_tpu.grid import (  # noqa: E402
    build_atom_grid_auto, grid_coulomb_energy_forces,
)
from nvalchemiops_tpu.interactions.electrostatics import (  # noqa: E402
    dense_coulomb_energy_forces,
    ewald_reciprocal_space,
    generate_k_vectors_ewald_summation,
    pme_reciprocal_space,
)

rng = np.random.default_rng(0)
n, box = 512, 12.0
pos64 = rng.uniform(0, box, (n, 3))
q64 = rng.normal(size=n)
q64 -= q64.mean()
cell64 = np.eye(3) * box
alpha = 0.5
cutoff = 5.0
dtype = jnp.float64 if mode == "ref" else jnp.float32

pos = jnp.asarray(pos64, dtype)
q = jnp.asarray(q64, dtype)
cell = jnp.asarray(cell64, dtype)

out = {}
e_dc, f_dc = dense_coulomb_energy_forces(pos, q, cell, cutoff, alpha)
out["dense_coulomb_e"] = np.asarray(e_dc, np.float64)
out["dense_coulomb_f"] = np.asarray(f_dc, np.float64)

g = build_atom_grid_auto(pos, cell, np.array([True] * 3), cutoff)
e_gc, f_gc = grid_coulomb_energy_forces(g, q, cutoff, alpha)
out["grid_coulomb_e"] = np.asarray(e_gc, np.float64)
out["grid_coulomb_f"] = np.asarray(f_gc, np.float64)

kv = generate_k_vectors_ewald_summation(cell, 4.0)
e_er = ewald_reciprocal_space(pos, q, cell, kv, alpha)
out["ewald_recip_e"] = np.asarray(e_er, np.float64)

e_pme, f_pme = pme_reciprocal_space(pos, q, cell, alpha,
                                    mesh_dimensions=(64,) * 3,
                                    compute_forces=True)
out["pme_e"] = np.asarray(e_pme, np.float64)
out["pme_f"] = np.asarray(f_pme, np.float64)

if mode == "ref":
    np.savez("/tmp/acc_ref.npz", **out)
    print("wrote /tmp/acc_ref.npz", flush=True)
else:
    ref = np.load("/tmp/acc_ref.npz")
    print(f"backend: {jax.default_backend()}", flush=True)
    for k in out:
        err = np.abs(out[k] - ref[k]).max()
        scale = np.abs(ref[k]).max()
        print(f"{k:16s}: max abs {err:.3e}   scale {scale:.3e}   "
              f"rel {err / scale:.3e}", flush=True)
