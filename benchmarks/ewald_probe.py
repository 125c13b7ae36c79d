# SPDX-License-Identifier: Apache-2.0
"""Batched Ewald reciprocal space vs the reference's headline config.

Reference (H100, BASELINE.md): 64 x 2000 = 128,000 atoms, energies only:
24.876 ms.  Our formulation: padded-batch phase matmuls on the MXU.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.interactions.electrostatics.ewald import _reciprocal_core
from nvalchemiops_tpu.interactions.electrostatics import (
    estimate_ewald_parameters, generate_k_vectors_ewald_summation)

rng = np.random.default_rng(0)
B, npersys = 64, 2000
box = 27.0  # ~2000 atoms CsCl-like density
pos = jnp.asarray(rng.uniform(0, box, (B*npersys, 3)), jnp.float32)
q = jnp.asarray(rng.normal(size=B*npersys), jnp.float32)
cells = jnp.asarray(np.tile(np.eye(3)*box, (B,1,1)), jnp.float32)
batch_idx = jnp.asarray(np.repeat(np.arange(B), npersys), jnp.int32)
batch_ptr = jnp.asarray(np.arange(B+1)*npersys, jnp.int32)

params = estimate_ewald_parameters(pos[:npersys], cells[0], accuracy=1e-6)
alpha = float(params.alpha[0]); kcut = float(params.reciprocal_space_cutoff[0])
kv = generate_k_vectors_ewald_summation(cells, kcut)
print(f"B={B} n/sys={npersys} alpha={alpha:.3f} K={kv.shape[1]}", flush=True)
alpha_arr = jnp.full((B,), alpha, jnp.float32)

dep = perturb_positions()
def step(p):
    e, f, cg = _reciprocal_core(p, q, cells, kv, alpha_arr, batch_idx, batch_ptr,
                                npersys, B, False, False)
    return e
t = measure(step, dep, (pos,), iters=4)
print(f"Ewald recip energies 128k atoms batched: {t*1e3:.2f}ms  [ref H100: 24.88ms]", flush=True)
def step_f(p):
    e, f, cg = _reciprocal_core(p, q, cells, kv, alpha_arr, batch_idx, batch_ptr,
                                npersys, B, True, False)
    return f
t = measure(step_f, dep, (pos,), iters=4)
print(f"Ewald recip + forces: {t*1e3:.2f}ms", flush=True)
