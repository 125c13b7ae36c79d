# SPDX-License-Identifier: Apache-2.0
"""Ewald summation tests: Madelung constants, alpha invariance, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.neighborlist import naive_neighbor_list
from nvalchemiops_tpu.interactions.electrostatics import (
    estimate_ewald_parameters,
    ewald_real_space,
    ewald_reciprocal_space,
    ewald_summation,
    generate_k_vectors_ewald_summation,
)

MADELUNG_NACL = 1.747564594633  # referred to nearest-neighbor distance
MADELUNG_CSCL = 1.762674773071


def rocksalt(n_rep=1, a=2.0):
    """NaCl structure; nearest-neighbor distance a/... (conventional cubic a -> d = a/2)."""
    base = np.array(
        [
            [0.0, 0.0, 0.0], [0.5, 0.5, 0.0], [0.5, 0.0, 0.5], [0.0, 0.5, 0.5],  # +
            [0.5, 0.0, 0.0], [0.0, 0.5, 0.0], [0.0, 0.0, 0.5], [0.5, 0.5, 0.5],  # -
        ]
    )
    charges = np.array([1.0] * 4 + [-1.0] * 4)
    frac, q = [], []
    for i in range(n_rep):
        for j in range(n_rep):
            for k in range(n_rep):
                frac.append((base + np.array([i, j, k])) / n_rep)
                q.append(charges)
    frac = np.concatenate(frac)
    cell = np.eye(3) * (a * n_rep)
    return frac @ cell, np.concatenate(q), cell, a / 2.0  # d_nn = a/2


def cscl(a=2.0):
    cell = np.eye(3) * a
    pos = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]) @ cell
    q = np.array([1.0, -1.0])
    d_nn = a * np.sqrt(3.0) / 2.0
    return pos, q, cell, d_nn


def full_ewald(pos, q, cell, accuracy=1e-8, compute_forces=False, alpha=None, k_cutoff=None):
    params = estimate_ewald_parameters(jnp.asarray(pos), jnp.asarray(cell), accuracy=accuracy)
    error_factor = np.sqrt(-2.0 * np.log(accuracy))
    if alpha is None:
        alpha = float(params.alpha[0])
        cutoff = float(params.real_space_cutoff[0])
    else:
        # keep the real-space truncation error consistent with the chosen alpha
        cutoff = error_factor / (np.sqrt(2.0) * alpha)
    k_cutoff = float(params.reciprocal_space_cutoff[0]) if k_cutoff is None else k_cutoff
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell),
        max_neighbors=2048,
    )
    return ewald_summation(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell),
        alpha=alpha, k_cutoff=k_cutoff,
        neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        compute_forces=compute_forces,
    )


@pytest.mark.parametrize(
    "builder,madelung",
    [(rocksalt, MADELUNG_NACL), (cscl, MADELUNG_CSCL)],
)
def test_madelung_constants(builder, madelung):
    pos, q, cell, d_nn = builder()
    energies = full_ewald(pos, q, cell)
    # E_total = -(N/2) * M / d_nn  for unit charges
    expected = -pos.shape[0] / 2.0 * madelung / d_nn
    np.testing.assert_allclose(float(energies.sum()), expected, rtol=1e-6)


def test_alpha_invariance():
    pos, q, cell, _ = rocksalt()
    e1 = float(full_ewald(pos, q, cell, alpha=0.9, k_cutoff=24.0).sum())
    e2 = float(full_ewald(pos, q, cell, alpha=1.3, k_cutoff=30.0).sum())
    np.testing.assert_allclose(e1, e2, rtol=1e-6)


def test_supercell_extensivity():
    pos1, q1, cell1, d = rocksalt(1)
    pos2, q2, cell2, _ = rocksalt(2)
    e1 = float(full_ewald(pos1, q1, cell1).sum())
    e2 = float(full_ewald(pos2, q2, cell2).sum())
    np.testing.assert_allclose(e2, 8.0 * e1, rtol=1e-6)


def test_reciprocal_forces_and_charge_grads_match_autodiff():
    rng = np.random.default_rng(5)
    cell = np.eye(3) * 5.0
    pos = rng.uniform(0, 5.0, (12, 3))
    q = rng.normal(size=12)
    q -= q.mean()
    alpha = 0.9
    kv = generate_k_vectors_ewald_summation(jnp.asarray(cell), 12.0)

    def e_total(p, qq):
        return ewald_reciprocal_space(
            p, qq, jnp.asarray(cell), kv, alpha
        ).sum()

    energies, forces, cg = ewald_reciprocal_space(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), kv, alpha,
        compute_forces=True, compute_charge_gradients=True,
    )
    g_pos = jax.grad(e_total, argnums=0)(jnp.asarray(pos), jnp.asarray(q))
    g_q = jax.grad(e_total, argnums=1)(jnp.asarray(pos), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(forces), -np.asarray(g_pos), atol=1e-9)
    np.testing.assert_allclose(np.asarray(cg), np.asarray(g_q), atol=1e-9)
    assert np.abs(np.asarray(forces).sum(axis=0)).max() < 1e-9


def test_full_summation_forces_match_autodiff():
    pos, q, cell, _ = rocksalt()
    rng = np.random.default_rng(6)
    pos = pos + rng.uniform(-0.05, 0.05, pos.shape)  # break symmetry
    params = estimate_ewald_parameters(jnp.asarray(pos), jnp.asarray(cell), accuracy=1e-8)
    alpha = float(params.alpha[0])
    cutoff = float(params.real_space_cutoff[0])
    kv = generate_k_vectors_ewald_summation(
        jnp.asarray(cell), float(params.reciprocal_space_cutoff[0])
    )
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell),
        max_neighbors=2048,
    )

    def e_total(p):
        return ewald_summation(
            p, jnp.asarray(q), jnp.asarray(cell), alpha=alpha, k_vectors=kv,
            neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        ).sum()

    energies, forces = ewald_summation(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), alpha=alpha,
        k_vectors=kv, neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        compute_forces=True,
    )
    g = jax.grad(e_total)(jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(forces), -np.asarray(g), atol=1e-8)


def test_batch_reciprocal_matches_per_system():
    rng = np.random.default_rng(7)
    cells = np.stack([np.eye(3) * 4.0, np.eye(3) * 5.0])
    sizes = [10, 14]
    pos = np.concatenate([rng.uniform(0, 4.0, (s, 3)) for s in sizes])
    q = rng.normal(size=sum(sizes))
    batch_idx = np.repeat([0, 1], sizes).astype(np.int32)
    alpha = np.array([1.0, 0.8])
    kv = generate_k_vectors_ewald_summation(jnp.asarray(cells), 14.0)

    out_b = ewald_reciprocal_space(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cells), kv,
        jnp.asarray(alpha), batch_idx=jnp.asarray(batch_idx),
        compute_forces=True,
    )
    e_b, f_b = out_b
    off = 0
    for b, s in enumerate(sizes):
        e_s, f_s = ewald_reciprocal_space(
            jnp.asarray(pos[off:off + s]), jnp.asarray(q[off:off + s]),
            jnp.asarray(cells[b]), kv[b], float(alpha[b]), compute_forces=True,
        )
        np.testing.assert_allclose(np.asarray(e_b)[off:off + s], np.asarray(e_s), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(f_b)[off:off + s], np.asarray(f_s), rtol=1e-8, atol=1e-12)
        off += s


def test_real_space_output_format_matrix():
    """{E, +F, +Q-grad} x {list, matrix} x {single, batch} — full dispatch
    matrix with no "currently require" branches (reference:
    ewald_kernels.py:265-1494's 12-kernel grid)."""
    from nvalchemiops_tpu.neighborlist import batch_naive_neighbor_list
    from nvalchemiops_tpu.neighborlist.neighbor_utils import (
        get_neighbor_list_from_neighbor_matrix,
    )

    rng = np.random.default_rng(11)
    cell = np.eye(3) * 5.0
    pos = rng.uniform(0, 5.0, (14, 3))
    q = rng.normal(size=14)
    alpha, cutoff = 0.8, 2.4

    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3),
        cell=jnp.asarray(cell), max_neighbors=64,
    )
    nl, nptr, ush = get_neighbor_list_from_neighbor_matrix(
        nm, num, neighbor_shift_matrix=sh, fill_value=14
    )

    # autodiff oracle over the matrix-format energy
    def e_total(p, qq):
        return ewald_real_space(
            p, qq, jnp.asarray(cell), alpha, neighbor_matrix=nm,
            neighbor_matrix_shifts=sh, mask_value=14, cutoff=cutoff,
        ).sum()

    g_pos = jax.grad(e_total, argnums=0)(jnp.asarray(pos), jnp.asarray(q))
    g_q = jax.grad(e_total, argnums=1)(jnp.asarray(pos), jnp.asarray(q))

    for fmt_kwargs in (
        dict(neighbor_matrix=nm, neighbor_matrix_shifts=sh, mask_value=14),
        dict(neighbor_list=nl, neighbor_ptr=nptr, neighbor_shifts=ush),
    ):
        e, f, cg = ewald_real_space(
            jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), alpha,
            compute_forces=True, compute_charge_gradients=True,
            cutoff=cutoff, **fmt_kwargs,
        )
        np.testing.assert_allclose(np.asarray(f), -np.asarray(g_pos), atol=1e-10)
        np.testing.assert_allclose(np.asarray(cg), np.asarray(g_q), atol=1e-10)
        e2, cg2 = ewald_real_space(
            jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), alpha,
            compute_charge_gradients=True, cutoff=cutoff, **fmt_kwargs,
        )
        np.testing.assert_allclose(np.asarray(cg2), np.asarray(cg), rtol=1e-12)

    # batched: two systems, per-system alpha, both formats
    sizes = [14, 10]
    pos_b = np.concatenate([pos, rng.uniform(0, 4.0, (10, 3))])
    q_b = np.concatenate([q, rng.normal(size=10)])
    cells = np.stack([cell, np.eye(3) * 4.0])
    batch_idx = np.repeat([0, 1], sizes).astype(np.int32)
    alphas = np.array([0.8, 1.1])

    nm_b, num_b, sh_b = batch_naive_neighbor_list(
        jnp.asarray(pos_b), cutoff, pbc=np.array([True] * 3),
        cell=jnp.asarray(cells), batch_idx=jnp.asarray(batch_idx),
        max_neighbors=64,
    )
    nl_b, nptr_b, ush_b = get_neighbor_list_from_neighbor_matrix(
        nm_b, num_b, neighbor_shift_matrix=sh_b, fill_value=24
    )
    outs = []
    for fmt_kwargs in (
        dict(neighbor_matrix=nm_b, neighbor_matrix_shifts=sh_b, mask_value=24),
        dict(neighbor_list=nl_b, neighbor_ptr=nptr_b, neighbor_shifts=ush_b),
    ):
        e, f, cg = ewald_real_space(
            jnp.asarray(pos_b), jnp.asarray(q_b), jnp.asarray(cells),
            jnp.asarray(alphas), batch_idx=jnp.asarray(batch_idx),
            compute_forces=True, compute_charge_gradients=True,
            cutoff=cutoff, **fmt_kwargs,
        )
        outs.append((np.asarray(e), np.asarray(f), np.asarray(cg)))
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12)

    # batch == per-system single calls (combined forces+charge-grad path,
    # both formats; round-2 VERDICT #9)
    e_b, f_b, cg_b = outs[1]
    start = 0
    for s, (n_s, a_s) in enumerate(zip(sizes, alphas)):
        sl = slice(start, start + n_s)
        nm_s, num_s, sh_s = naive_neighbor_list(
            jnp.asarray(pos_b[sl]), cutoff, pbc=np.array([True] * 3),
            cell=jnp.asarray(cells[s]), max_neighbors=64)
        nl_s, nptr_s, ush_s = get_neighbor_list_from_neighbor_matrix(
            nm_s, num_s, neighbor_shift_matrix=sh_s, fill_value=n_s)
        e_s, f_s, cg_s = ewald_real_space(
            jnp.asarray(pos_b[sl]), jnp.asarray(q_b[sl]),
            jnp.asarray(cells[s]), a_s, compute_forces=True,
            compute_charge_gradients=True, cutoff=cutoff,
            neighbor_list=nl_s, neighbor_ptr=nptr_s, neighbor_shifts=ush_s)
        np.testing.assert_allclose(e_b[sl], np.asarray(e_s), rtol=1e-10)
        np.testing.assert_allclose(f_b[sl], np.asarray(f_s), atol=1e-10)
        np.testing.assert_allclose(cg_b[sl], np.asarray(cg_s), atol=1e-10)
        start += n_s
    # batch slice 0 == single-system result (same alpha)
    np.testing.assert_allclose(outs[0][2][:14], np.asarray(g_q), atol=1e-10)


def test_real_space_charged_system_background():
    # non-neutral system: background correction keeps alpha-invariance
    pos, q, cell, _ = cscl()
    q = np.array([1.0, -0.5])  # net charge +0.5
    e1 = float(full_ewald(pos, q, cell, alpha=1.2, k_cutoff=26.0).sum())
    e2 = float(full_ewald(pos, q, cell, alpha=1.6, k_cutoff=34.0).sum())
    np.testing.assert_allclose(e1, e2, rtol=1e-5)
