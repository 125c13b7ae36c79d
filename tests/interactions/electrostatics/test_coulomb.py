# SPDX-License-Identifier: Apache-2.0
"""Coulomb tests: numpy oracle, autodiff/analytic force agreement, formats."""

import numpy as np
import jax
import jax.numpy as jnp

from nvalchemiops_tpu.neighborlist import naive_neighbor_list, batch_naive_neighbor_list
from nvalchemiops_tpu.interactions.electrostatics import (
    coulomb_energy,
    coulomb_energy_forces,
    coulomb_forces,
)
from scipy.special import erfc as np_erfc


def numpy_coulomb(pos, q, cell, shifts_rows, cutoff, alpha):
    """Direct per-atom energy from oracle neighbor rows (j, S)."""
    n = pos.shape[0]
    e = np.zeros(n)
    for a in range(n):
        for (b, sx, sy, sz) in shifts_rows[a]:
            d = pos[b] + np.array([sx, sy, sz]) @ cell - pos[a]
            r = np.linalg.norm(d)
            if r >= cutoff or r < 1e-10:
                continue
            phi = np_erfc(alpha * r) / r if alpha > 0 else 1.0 / r
            e[a] += 0.5 * q[a] * q[b] * phi
    return e


def setup(seed=0, n=24):
    rng = np.random.default_rng(seed)
    cell = np.eye(3) * 6.0
    pos = rng.uniform(0, 6.0, (n, 3))
    q = rng.normal(size=n)
    q -= q.mean()
    return pos, q, cell


def test_energy_matches_numpy_oracle():
    from tests.neighborlist.oracle import brute_force_neighbors

    pos, q, cell = setup(1)
    cutoff, alpha = 4.0, 0.35
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell)
    )
    rows = brute_force_neighbors(pos, cutoff, cell, [True] * 3)
    for a in (0.0, alpha):
        e = coulomb_energy(
            jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), cutoff, a,
            neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        )
        np.testing.assert_allclose(
            np.asarray(e), numpy_coulomb(pos, q, cell, rows, cutoff, a), rtol=1e-10
        )


def test_forces_equal_negative_gradient():
    pos, q, cell = setup(2)
    cutoff, alpha = 4.0, 0.4
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell)
    )
    e, f = coulomb_energy_forces(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), cutoff, alpha,
        neighbor_matrix=nm, neighbor_matrix_shifts=sh,
    )
    grad = jax.grad(
        lambda p: coulomb_energy(
            p, jnp.asarray(q), jnp.asarray(cell), cutoff, alpha,
            neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        ).sum()
    )(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(f), -np.asarray(grad), atol=1e-11)
    # momentum conservation
    assert np.abs(np.asarray(f).sum(axis=0)).max() < 1e-10


def test_list_and_matrix_formats_agree():
    pos, q, cell = setup(3)
    cutoff, alpha = 3.5, 0.3
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell)
    )
    nl, ptr, ush = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell),
        return_neighbor_list=True,
    )
    args = (jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), cutoff, alpha)
    e_m, f_m = coulomb_energy_forces(*args, neighbor_matrix=nm, neighbor_matrix_shifts=sh)
    e_l, f_l = coulomb_energy_forces(
        *args, neighbor_list=nl, neighbor_ptr=ptr, neighbor_shifts=ush
    )
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_l), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_m), np.asarray(f_l), rtol=1e-10, atol=1e-12)
    f_only = coulomb_forces(*args, neighbor_matrix=nm, neighbor_matrix_shifts=sh)
    np.testing.assert_allclose(np.asarray(f_only), np.asarray(f_m))


def test_batch_matches_per_system():
    rng = np.random.default_rng(4)
    cells = np.stack([np.eye(3) * 5.0, np.diag([6.0, 5.0, 7.0])])
    sizes = [14, 20]
    pos = np.concatenate([rng.uniform(0, 4.5, (s, 3)) for s in sizes])
    q = rng.normal(size=sum(sizes))
    batch_idx = np.repeat([0, 1], sizes).astype(np.int32)
    cutoff, alpha = 3.0, 0.25

    pbc = np.tile([True, True, True], (2, 1))
    nm, num, sh = batch_naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=pbc, cell=jnp.asarray(cells),
        batch_idx=jnp.asarray(batch_idx),
    )
    e_b, f_b = coulomb_energy_forces(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cells), cutoff, alpha,
        neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        batch_idx=jnp.asarray(batch_idx),
    )
    off = 0
    for b, s in enumerate(sizes):
        nm_s, num_s, sh_s = naive_neighbor_list(
            jnp.asarray(pos[off:off + s]), cutoff,
            pbc=np.array([True] * 3), cell=jnp.asarray(cells[b]),
        )
        e_s, f_s = coulomb_energy_forces(
            jnp.asarray(pos[off:off + s]), jnp.asarray(q[off:off + s]),
            jnp.asarray(cells[b]), cutoff, alpha,
            neighbor_matrix=nm_s, neighbor_matrix_shifts=sh_s,
        )
        np.testing.assert_allclose(np.asarray(e_b)[off:off + s], np.asarray(e_s), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(f_b)[off:off + s], np.asarray(f_s), rtol=1e-8, atol=1e-12)
        off += s
