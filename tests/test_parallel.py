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


def test_sharded_batch_pme_matches_unsharded():
    """Batch-sharded PME over the dp mesh == the plain batch pipeline."""
    from jax.sharding import Mesh
    from nvalchemiops_tpu.interactions.electrostatics.pme import (
        batch_pme_reciprocal,
    )
    from nvalchemiops_tpu.parallel import sharded_batch_pme_reciprocal

    rng = np.random.default_rng(11)
    b, n, box = 2 * jax.device_count(), 48, 9.0
    pos = jnp.asarray(rng.uniform(0, box, (b, n, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    mesh_dims = (16, 16, 16)
    e_ref, f_ref = batch_pme_reciprocal(pos, q, cell, 0.4, mesh_dims,
                                        compute_forces=True)
    bmesh = Mesh(np.array(jax.devices()), ("dp",))
    e_sh, f_sh = sharded_batch_pme_reciprocal(bmesh, pos, q, cell, 0.4,
                                              mesh_dims,
                                              compute_forces=True)
    np.testing.assert_allclose(np.asarray(e_sh), np.asarray(e_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref),
                               rtol=2e-5, atol=1e-6)

    # non-divisible batch must be rejected, not silently truncated
    import pytest
    with pytest.raises(ValueError):
        sharded_batch_pme_reciprocal(bmesh, pos[:b - 1], q[:b - 1], cell,
                                     0.4, mesh_dims)


def test_dryrun_multichip():
    dryrun_multichip(jax.device_count())
