# SPDX-License-Identifier: Apache-2.0
"""PME tests: Ewald agreement, Madelung, mesh convergence, gradients, batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.neighborlist import naive_neighbor_list
from nvalchemiops_tpu.interactions.electrostatics import (
    estimate_ewald_parameters,
    estimate_pme_parameters,
    ewald_reciprocal_space,
    generate_k_vectors_ewald_summation,
    particle_mesh_ewald,
    pme_reciprocal_space,
)

from .test_ewald import MADELUNG_NACL, full_ewald, rocksalt


def perturbed_rocksalt(seed=0, scale=0.06):
    pos, q, cell, d = rocksalt(2, a=2.2)
    rng = np.random.default_rng(seed)
    pos = pos + rng.uniform(-scale, scale, pos.shape)
    return pos, q, cell


def run_pme(pos, q, cell, alpha, cutoff, mesh=(32, 32, 32), order=4, **kw):
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell),
        max_neighbors=1024,
    )
    return particle_mesh_ewald(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell),
        alpha=alpha, mesh_dimensions=mesh, spline_order=order,
        neighbor_matrix=nm, neighbor_matrix_shifts=sh, **kw,
    )


def test_pme_matches_ewald_total_energy():
    pos, q, cell = perturbed_rocksalt(1)
    e_ewald = float(full_ewald(pos, q, cell, accuracy=1e-10).sum())
    alpha = 1.6
    cutoff = np.sqrt(-2 * np.log(1e-10)) / (np.sqrt(2) * alpha)
    e_pme = float(run_pme(pos, q, cell, alpha, cutoff, mesh=(48, 48, 48)).sum())
    np.testing.assert_allclose(e_pme, e_ewald, rtol=5e-6)


def test_pme_madelung():
    pos, q, cell, d_nn = rocksalt(1, a=2.0)
    alpha = 1.8
    cutoff = np.sqrt(-2 * np.log(1e-9)) / (np.sqrt(2) * alpha)
    e = float(run_pme(pos, q, cell, alpha, cutoff, mesh=(40, 40, 40)).sum())
    expected = -pos.shape[0] / 2.0 * MADELUNG_NACL / d_nn
    np.testing.assert_allclose(e, expected, rtol=5e-6)


def test_mesh_convergence():
    pos, q, cell = perturbed_rocksalt(2)
    alpha = 1.4
    cutoff = 3.2
    errs = []
    e_ref = float(run_pme(pos, q, cell, alpha, cutoff, mesh=(64, 64, 64)).sum())
    for m in (16, 24, 32):
        e = float(run_pme(pos, q, cell, alpha, cutoff, mesh=(m, m, m)).sum())
        errs.append(abs(e - e_ref))
    assert errs[0] > errs[2]  # finer mesh -> smaller error
    assert errs[2] < 1e-4 * abs(e_ref)


def test_pme_reciprocal_forces_match_autodiff_and_ewald():
    pos, q, cell = perturbed_rocksalt(3)
    alpha = 1.5
    mesh = (32, 32, 32)

    energies, forces, cg = pme_reciprocal_space(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), alpha,
        mesh_dimensions=mesh, compute_forces=True, compute_charge_gradients=True,
    )

    def e_total(p, qq):
        return pme_reciprocal_space(
            p, qq, jnp.asarray(cell), alpha, mesh_dimensions=mesh
        ).sum()

    g_pos = jax.grad(e_total, argnums=0)(jnp.asarray(pos), jnp.asarray(q))
    g_q = jax.grad(e_total, argnums=1)(jnp.asarray(pos), jnp.asarray(q))
    # spline-derivative (smooth-PME) forces are exactly -dE/dr of the
    # discrete energy up to the uniform net-force removal, so the autodiff
    # agreement is much tighter than the reference's ik-space discretization
    f = np.asarray(forces)
    scale = np.abs(f).max()
    np.testing.assert_allclose(f, -np.asarray(g_pos), atol=5e-4 * scale)
    np.testing.assert_allclose(np.asarray(cg), np.asarray(g_q), atol=1e-8)

    # and against the exact Ewald reciprocal forces (mesh-accuracy agreement;
    # the gradient discretization has a slightly larger error constant than
    # ik differentiation at the same mesh)
    kv = generate_k_vectors_ewald_summation(jnp.asarray(cell), 22.0)
    e_ref, f_ref = ewald_reciprocal_space(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), kv, alpha,
        compute_forces=True,
    )
    np.testing.assert_allclose(float(energies.sum()), float(e_ref.sum()), rtol=1e-5)
    np.testing.assert_allclose(f, np.asarray(f_ref), atol=3e-3 * scale)
    # physics invariants
    assert np.abs(f.sum(axis=0)).max() < 1e-6 * scale


def test_translation_invariance():
    pos, q, cell = perturbed_rocksalt(4)
    alpha = 1.5
    mesh = (32, 32, 32)
    e1 = pme_reciprocal_space(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cell), alpha, mesh_dimensions=mesh
    )
    shift = np.array([0.31, -0.17, 0.53])
    e2 = pme_reciprocal_space(
        jnp.asarray(pos + shift), jnp.asarray(q), jnp.asarray(cell), alpha,
        mesh_dimensions=mesh,
    )
    np.testing.assert_allclose(float(e1.sum()), float(e2.sum()), rtol=1e-5)


def test_batch_pme_matches_per_system():
    rng = np.random.default_rng(5)
    cells = np.stack([np.eye(3) * 4.0, np.eye(3) * 5.0])
    sizes = [12, 16]
    pos = np.concatenate([rng.uniform(0, 4.0, (s, 3)) for s in sizes])
    q = rng.normal(size=sum(sizes))
    off = 0
    for s in sizes:  # neutralize each system
        q[off:off + s] -= q[off:off + s].mean()
        off += s
    batch_idx = jnp.asarray(np.repeat([0, 1], sizes).astype(np.int32))
    alpha = np.array([1.2, 1.0])
    mesh = (16, 16, 16)

    out_b = pme_reciprocal_space(
        jnp.asarray(pos), jnp.asarray(q), jnp.asarray(cells), jnp.asarray(alpha),
        mesh_dimensions=mesh, batch_idx=batch_idx, compute_forces=True,
    )
    e_b, f_b = out_b
    off = 0
    for b, s in enumerate(sizes):
        e_s, f_s = pme_reciprocal_space(
            jnp.asarray(pos[off:off + s]), jnp.asarray(q[off:off + s]),
            jnp.asarray(cells[b]), float(alpha[b]), mesh_dimensions=mesh,
            compute_forces=True,
        )
        np.testing.assert_allclose(np.asarray(e_b)[off:off + s], np.asarray(e_s), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(f_b)[off:off + s], np.asarray(f_s), rtol=1e-9, atol=1e-12)
        off += s


def test_parameter_estimation_accuracy_autotune():
    pos, q, cell = perturbed_rocksalt(6)
    params = estimate_pme_parameters(jnp.asarray(pos), jnp.asarray(cell), accuracy=1e-6)
    alpha = float(params.alpha[0])
    cutoff = float(params.real_space_cutoff[0])
    e_auto = float(
        run_pme(pos, q, cell, alpha, cutoff, mesh=params.mesh_dimensions).sum()
    )
    e_ref = float(full_ewald(pos, q, cell, accuracy=1e-10).sum())
    np.testing.assert_allclose(e_auto, e_ref, rtol=5e-5)


def test_grid_particle_mesh_ewald_matches_ewald_summation():
    """At-scale full PME (grid real + windowed recip) vs Ewald summation."""
    import numpy as np
    import jax.numpy as jnp
    from nvalchemiops_tpu.grid import build_atom_grid_auto
    from nvalchemiops_tpu.interactions.electrostatics import (
        ewald_summation, grid_particle_mesh_ewald,
    )
    from nvalchemiops_tpu.neighborlist import naive_neighbor_list

    rng = np.random.default_rng(31)
    n, box = 192, 12.0
    pos = jnp.asarray(rng.uniform(0, box, (n, 3)), jnp.float32)
    q_np = rng.normal(size=n)
    q = jnp.asarray(q_np - q_np.mean(), jnp.float32)
    cell = jnp.asarray(np.eye(3) * box, jnp.float32)
    pbc = np.array([True] * 3)
    cutoff = 5.0

    grid = build_atom_grid_auto(pos, cell, pbc, cutoff)
    e_pme, f_pme = grid_particle_mesh_ewald(
        grid, pos, q, cell, cutoff, mesh_dimensions=(32, 32, 32))

    alpha = float(np.sqrt(-np.log(1e-6)) / cutoff)
    nm, num, sh = naive_neighbor_list(pos, cutoff, cell=cell, pbc=pbc,
                                      max_neighbors=128)
    e_ew, f_ew = ewald_summation(
        pos, q, cell, alpha=alpha,
        k_cutoff=18.0, neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        compute_forces=True)

    et_p, et_e = float(jnp.sum(e_pme)), float(jnp.sum(e_ew))
    np.testing.assert_allclose(et_p, et_e, rtol=2e-4)
    fs = float(jnp.max(jnp.abs(f_ew)))
    assert float(jnp.max(jnp.abs(f_pme - f_ew))) / fs < 2e-3
