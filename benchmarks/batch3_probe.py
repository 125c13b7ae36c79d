# SPDX-License-Identifier: Apache-2.0
"""Probe: batched PME windowed engine with the Mosaic spread/gather kernels.

Matched config (reference H100 5.76 ms energies-only): 64 x 2000 atoms,
32^3 mesh.  Measures the vmapped pallas spread (and gather) engines
against the jnp windowed path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from nvalchemiops_tpu.interactions.electrostatics.pme import (  # noqa: E402
    batch_pme_reciprocal,
)

dep = perturb_positions()
rng = np.random.default_rng(0)

B, npa, box = 64, 2000, 26.0
mesh = (32, 32, 32)
pos_b = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q_b = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
q_b = q_b - q_b.mean(axis=1, keepdims=True)
cell_b = jnp.asarray(np.eye(3) * box, jnp.float32)

for forces in (False, True):
    for se, ge in (("xla", "xla"), ("pallas", "xla"), ("pallas", "pallas")):
        def f(p, fo=forces, se=se, ge=ge):
            out = batch_pme_reciprocal(
                p, q_b, cell_b, 0.35, mesh, compute_forces=fo,
                spread_engine=se, gather_engine=ge)
            return out[1] if fo else out

        try:
            t = measure(f, dep, (pos_b,), iters=3)
            print(f"batch PME {'E+F' if forces else 'E  '} "
                  f"spread={se:6s} gather={ge:6s}: {t*1e3:7.2f} ms",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"batch PME F={forces} {se}/{ge}: failed "
                  f"{type(exc).__name__}: {exc}", flush=True)
print("done", flush=True)
