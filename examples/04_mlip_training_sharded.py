# SPDX-License-Identifier: Apache-2.0
"""Train the built-in MLIP with data+atom sharding over all local devices."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nvalchemiops_tpu.parallel import (
    default_d3_tables,
    init_mlip_params,
    make_mesh,
    shard_batch,
    sharded_train_step,
)

zmax = 4
dtype = jnp.float32
rng = np.random.default_rng(0)
num_systems, atoms = 8, 64
box = 6.0

batch = (
    jnp.asarray(rng.uniform(0, box, (num_systems, atoms, 3)), dtype),
    jnp.asarray(rng.integers(1, zmax + 1, (num_systems, atoms)), jnp.int32),
    jnp.asarray(np.tile(np.eye(3) * box, (num_systems, 1, 1)), dtype),
    jnp.asarray(rng.normal(size=num_systems), dtype),
    jnp.asarray(rng.normal(size=(num_systems, atoms, 3)) * 0.01, dtype),
)

mesh = make_mesh()
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))
params = init_mlip_params(zmax, dtype)
tables = default_d3_tables(zmax, dtype=dtype)
step = sharded_train_step(mesh, cutoff=2.9, lr=1e-8)  # toy data: tiny lr

sbatch = shard_batch(mesh, batch)
with mesh:
    for i in range(5):
        params, loss = step(params, tables, sbatch)
        print(f"step {i}: loss {float(loss):.6f}")
