# SPDX-License-Identifier: Apache-2.0
"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from nvalchemiops_tpu.parallel import (
    default_d3_tables,
    init_mlip_params,
    make_mesh,
    shard_batch,
    sharded_train_step,
    train_step,
)
from __graft_entry__ import _make_batch, dryrun_multichip, entry


def test_entry_compiles_and_runs():
    forward, args = entry()
    energies, forces = jax.jit(forward)(*args)
    assert np.isfinite(np.asarray(energies)).all()
    assert np.isfinite(np.asarray(forces)).all()
    # forces sum to ~zero per system (translation invariance)
    assert np.abs(np.asarray(forces).sum(axis=1)).max() < 1e-3


def test_sharded_step_matches_single_device():
    zmax = 4
    dtype = jnp.float64
    params = init_mlip_params(zmax, dtype)
    tables = default_d3_tables(zmax, dtype=dtype)
    batch = _make_batch(4, 32, zmax, dtype)
    cutoff = 2.9

    # single device reference
    ref_params, ref_loss = train_step(params, tables, batch, cutoff, lr=1e-3)

    # sharded over all devices
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count()
    sbatch = shard_batch(mesh, batch)
    step = sharded_train_step(mesh, cutoff, lr=1e-3)
    with mesh:
        new_params, loss = step(params, tables, sbatch)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-10)
    for a, b in zip(jax.tree_util.tree_leaves(ref_params), jax.tree_util.tree_leaves(new_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)


def test_dryrun_multichip():
    dryrun_multichip(jax.device_count())
