# SPDX-License-Identifier: Apache-2.0
"""DFT-D3(BJ) tests: numpy oracle, finite differences, formats, batching."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.interactions.dispersion import D3Parameters, dftd3
from nvalchemiops_tpu.neighborlist import naive_neighbor_list


ZMAX = 5


def element_tables(seed=0):
    """Deliberately non-physical but numerically stable tables.

    Same strategy as the reference's dispersion conftest (SURVEY.md §4.7).
    """
    rng = np.random.default_rng(seed)
    rcov = np.concatenate([[0.0], rng.uniform(0.6, 1.4, ZMAX)])
    r4r2 = np.concatenate([[0.0], rng.uniform(2.0, 6.0, ZMAX)])
    c6ab = np.zeros((ZMAX + 1, ZMAX + 1, 5, 5))
    cn_ref = np.zeros((ZMAX + 1, ZMAX + 1, 5, 5))
    for zi in range(1, ZMAX + 1):
        for zj in range(1, ZMAX + 1):
            # a few active reference pairs with smooth values
            c6 = rng.uniform(5.0, 40.0, (5, 5))
            c6[rng.random((5, 5)) < 0.3] = 0.0  # some zero refs, like real tables
            c6ab[zi, zj] = 0.5 * (c6 + c6.T) if zi == zj else c6
            cn_ref[zi, zj] = np.cumsum(rng.uniform(0.3, 1.0, (5, 5)), axis=0)
    # symmetry convention: c6ab[zi, zj, p, q] pairs with c6ab[zj, zi, q, p]
    for zi in range(1, ZMAX + 1):
        for zj in range(1, ZMAX + 1):
            c6ab[zj, zi] = c6ab[zi, zj].T
    return D3Parameters(rcov=rcov, r4r2=r4r2, c6ab=c6ab, cn_ref=cn_ref)


def numpy_dftd3_energy(pos, numbers, params, a1, a2, s8, k1=16.0, k3=-4.0, s6=1.0,
                       cell=None, shift_rows=None, cutoff=None):
    """Independent dense numpy implementation of the D3(BJ) two-body energy."""
    rcov = np.asarray(params.rcov)
    r4r2 = np.asarray(params.r4r2)
    c6ab = np.asarray(params.c6ab)
    cn_ref = np.asarray(params.cn_ref)
    n = len(numbers)

    def pairs_for(a):
        if shift_rows is not None:
            return [
                (b, np.array([sx, sy, sz], dtype=float) @ cell)
                for (b, sx, sy, sz) in shift_rows[a]
            ]
        return [(b, np.zeros(3)) for b in range(n) if b != a]

    # CN
    cn = np.zeros(n)
    for a in range(n):
        if numbers[a] == 0:
            continue
        for b, sh in pairs_for(a):
            if numbers[b] == 0:
                continue
            r = np.linalg.norm(pos[b] + sh - pos[a])
            if r < 1e-12 or (cutoff is not None and r >= cutoff):
                continue
            rc = rcov[numbers[a]] + rcov[numbers[b]]
            cn[a] += 1.0 / (1.0 + np.exp(-k1 * (rc / r - 1.0)))

    def c6_of(za, zb, cna, cnb):
        mat = c6ab[za, zb]
        ca = cn_ref[za, zb]
        cb = cn_ref[zb, za]
        # max-shifted exponents: CN far outside the reference grid (e.g.
        # CN ~ 8 in ionic crystals vs grid max ~ 1) underflows the raw
        # exp to 0/0; the shifted form keeps the correct
        # nearest-reference limit, and is identical where nothing
        # underflows (the library stabilizes the same way)
        exps, vals = [], []
        for p in range(5):
            for q in range(5):
                if mat[p, q] == 0.0:
                    continue
                exps.append(
                    k3 * ((cna - ca[p, q]) ** 2 + (cnb - cb[q, p]) ** 2))
                vals.append(mat[p, q])
        if not exps:
            return 0.0
        m = max(exps)
        w = sum(np.exp(x - m) for x in exps)
        z = sum(v * np.exp(x - m) for v, x in zip(vals, exps))
        return z / w

    e = 0.0
    for a in range(n):
        if numbers[a] == 0:
            continue
        for b, sh in pairs_for(a):
            if numbers[b] == 0:
                continue
            r = np.linalg.norm(pos[b] + sh - pos[a])
            if r < 1e-12 or (cutoff is not None and r >= cutoff):
                continue
            c6 = c6_of(numbers[a], numbers[b], cn[a], cn[b])
            if c6 < 1e-12:
                continue
            rr = 3.0 * r4r2[numbers[a]] * r4r2[numbers[b]]
            r0 = a1 * np.sqrt(rr) + a2
            e += 0.5 * -c6 * (
                s6 / (r**6 + r0**6) + s8 * rr / (r**8 + r0**8)
            )
    return e, cn


A1, A2, S8 = 0.40, 4.2, 1.85


def molecule(seed, n=12):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 4.0, (n, 3))
    numbers = rng.integers(1, ZMAX + 1, n).astype(np.int32)
    return pos, numbers


def nl_for(pos, cutoff=1e9):
    return naive_neighbor_list(jnp.asarray(pos), min(cutoff, 1e3), max_neighbors=256)


def test_energy_and_cn_match_numpy_oracle():
    params = element_tables()
    pos, numbers = molecule(1)
    nm, num = nl_for(pos)
    e, f, cn = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, neighbor_matrix=nm, output_dtype=None,
    )
    e_ref, cn_ref = numpy_dftd3_energy(pos, numbers, params, A1, A2, S8)
    np.testing.assert_allclose(float(e.sum()), e_ref, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(cn), cn_ref, rtol=1e-10)


def test_energy_pbc_matches_numpy_oracle():
    from tests.neighborlist.oracle import brute_force_neighbors

    params = element_tables()
    rng = np.random.default_rng(2)
    cell = np.eye(3) * 5.0
    pos = rng.uniform(0, 5.0, (8, 3))
    numbers = rng.integers(1, ZMAX + 1, 8).astype(np.int32)
    cutoff = 4.0
    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell)
    )
    rows = brute_force_neighbors(pos, cutoff, cell, [True] * 3)
    e, f, cn = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, cell=jnp.asarray(cell),
        neighbor_matrix=nm, neighbor_matrix_shifts=sh, output_dtype=None,
    )
    e_ref, cn_oracle = numpy_dftd3_energy(
        pos, numbers, params, A1, A2, S8, cell=cell, shift_rows=rows, cutoff=cutoff
    )
    np.testing.assert_allclose(np.asarray(cn), cn_oracle, rtol=1e-10)
    np.testing.assert_allclose(float(e.sum()), e_ref, rtol=1e-10)


def test_forces_match_finite_differences():
    params = element_tables()
    pos, numbers = molecule(3, n=8)
    nm, num = nl_for(pos)

    def energy_at(p):
        e, _, _ = dftd3(
            jnp.asarray(p), jnp.asarray(numbers), A1, A2, S8,
            d3_params=params, neighbor_matrix=nm, output_dtype=None,
        )
        return float(e.sum())

    _, forces, _ = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, neighbor_matrix=nm, output_dtype=None,
    )
    h = 1e-6
    for atom in (0, 3, 7):
        for dim in range(3):
            dp = pos.copy(); dp[atom, dim] += h
            dm = pos.copy(); dm[atom, dim] -= h
            fd = -(energy_at(dp) - energy_at(dm)) / (2 * h)
            np.testing.assert_allclose(float(forces[atom, dim]), fd, rtol=2e-5, atol=1e-9)


def test_virial_matches_strain_derivative():
    from tests.neighborlist.oracle import brute_force_neighbors

    params = element_tables()
    rng = np.random.default_rng(4)
    cell0 = np.eye(3) * 5.0
    pos0 = rng.uniform(0, 5.0, (8, 3))
    numbers = rng.integers(1, ZMAX + 1, 8).astype(np.int32)
    cutoff = 4.5

    def energy_at(eps):
        strain = np.eye(3) + eps
        pos = pos0 @ strain.T
        cell = cell0 @ strain.T
        nm, num, sh = naive_neighbor_list(
            jnp.asarray(pos), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell),
            max_neighbors=256,
        )
        e, _, _ = dftd3(
            jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
            d3_params=params, cell=jnp.asarray(cell),
            neighbor_matrix=nm, neighbor_matrix_shifts=sh, output_dtype=None,
        )
        return float(e.sum())

    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos0), cutoff, pbc=np.array([True] * 3), cell=jnp.asarray(cell0),
        max_neighbors=256,
    )
    _, _, _, virial = dftd3(
        jnp.asarray(pos0), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, cell=jnp.asarray(cell0),
        neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        compute_virial=True, output_dtype=None,
    )
    h = 1e-6
    for (a, b) in ((0, 0), (1, 1), (0, 1), (2, 0)):
        eps_p = np.zeros((3, 3)); eps_p[a, b] = h
        eps_m = np.zeros((3, 3)); eps_m[a, b] = -h
        fd = (energy_at(eps_p) - energy_at(eps_m)) / (2 * h)
        np.testing.assert_allclose(-float(virial[0, a, b]), fd, rtol=5e-5, atol=1e-8)


def test_list_format_matches_matrix():
    params = element_tables()
    pos, numbers = molecule(5)
    nm, num = nl_for(pos)
    nl, ptr = naive_neighbor_list(jnp.asarray(pos), 1e3, max_neighbors=256,
                                  return_neighbor_list=True)
    e_m, f_m, cn_m = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, neighbor_matrix=nm, output_dtype=None,
    )
    e_l, f_l, cn_l = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, neighbor_list=nl, neighbor_ptr=ptr, output_dtype=None,
    )
    np.testing.assert_allclose(np.asarray(e_m), np.asarray(e_l), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_m), np.asarray(f_l), rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(np.asarray(cn_m), np.asarray(cn_l), rtol=1e-12)


def test_list_format_periodic_batch_virial():
    """Native pair-list pipeline: periodic, batched, virial — all vs matrix."""
    params = element_tables()
    rng = np.random.default_rng(21)
    cell = np.eye(3) * 7.0
    pos = rng.uniform(0, 7.0, (30, 3))
    numbers = rng.integers(1, 5, 30).astype(np.int32)
    cutoff = 4.5

    nm, num, sh = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3),
        cell=jnp.asarray(cell), max_neighbors=128,
    )
    nl, ptr, ush = naive_neighbor_list(
        jnp.asarray(pos), cutoff, pbc=np.array([True] * 3),
        cell=jnp.asarray(cell), max_neighbors=128, return_neighbor_list=True,
    )
    out_m = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, cell=jnp.asarray(cell),
        neighbor_matrix=nm, neighbor_matrix_shifts=sh,
        compute_virial=True, output_dtype=None,
    )
    out_l = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, cell=jnp.asarray(cell),
        neighbor_list=nl, neighbor_ptr=ptr, unit_shifts=ush,
        compute_virial=True, output_dtype=None,
    )
    for a, b in zip(out_m, out_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-13)

    # batched: two systems through the list path vs the matrix path
    from nvalchemiops_tpu.neighborlist import batch_naive_neighbor_list
    from nvalchemiops_tpu.neighborlist.neighbor_utils import (
        get_neighbor_list_from_neighbor_matrix,
    )

    pos_b = np.concatenate([pos, rng.uniform(0, 6.0, (22, 3))])
    num_b = np.concatenate([numbers, rng.integers(1, 5, 22).astype(np.int32)])
    cells = np.stack([cell, np.eye(3) * 6.0])
    batch_idx = np.repeat([0, 1], [30, 22]).astype(np.int32)
    nm_b, nn_b, sh_b = batch_naive_neighbor_list(
        jnp.asarray(pos_b), cutoff, pbc=np.array([True] * 3),
        cell=jnp.asarray(cells), batch_idx=jnp.asarray(batch_idx),
        max_neighbors=128,
    )
    nl_b, ptr_b, ush_b = get_neighbor_list_from_neighbor_matrix(
        nm_b, nn_b, neighbor_shift_matrix=sh_b, fill_value=52
    )
    e_m, f_m, cn_m = dftd3(
        jnp.asarray(pos_b), jnp.asarray(num_b), A1, A2, S8,
        d3_params=params, cell=jnp.asarray(cells),
        neighbor_matrix=nm_b, neighbor_matrix_shifts=sh_b,
        batch_idx=jnp.asarray(batch_idx), num_systems=2, output_dtype=None,
    )
    e_l, f_l, cn_l = dftd3(
        jnp.asarray(pos_b), jnp.asarray(num_b), A1, A2, S8,
        d3_params=params, cell=jnp.asarray(cells),
        neighbor_list=nl_b, neighbor_ptr=ptr_b, unit_shifts=ush_b,
        batch_idx=jnp.asarray(batch_idx), num_systems=2, output_dtype=None,
    )
    np.testing.assert_allclose(np.asarray(e_l), np.asarray(e_m), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f_l), np.asarray(f_m),
                               rtol=1e-9, atol=1e-13)
    np.testing.assert_allclose(np.asarray(cn_l), np.asarray(cn_m), rtol=1e-12)


def test_batch_matches_per_system():
    params = element_tables()
    pos1, numbers1 = molecule(6, n=10)
    pos2, numbers2 = molecule(7, n=14)
    pos = np.concatenate([pos1, pos2])
    numbers = np.concatenate([numbers1, numbers2])
    batch_idx = np.repeat([0, 1], [10, 14]).astype(np.int32)
    from nvalchemiops_tpu.neighborlist import batch_naive_neighbor_list

    nm, num = batch_naive_neighbor_list(
        jnp.asarray(pos), 1e3, batch_idx=jnp.asarray(batch_idx), max_neighbors=256
    )
    e_b, f_b, cn_b = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, neighbor_matrix=nm, batch_idx=jnp.asarray(batch_idx),
        num_systems=2, output_dtype=None,
    )
    for b, (p, z, sl) in enumerate(
        [(pos1, numbers1, slice(0, 10)), (pos2, numbers2, slice(10, 24))]
    ):
        nm_s, num_s = nl_for(p)
        e_s, f_s, cn_s = dftd3(
            jnp.asarray(p), jnp.asarray(z), A1, A2, S8,
            d3_params=params, neighbor_matrix=nm_s, output_dtype=None,
        )
        np.testing.assert_allclose(float(e_b[b]), float(e_s.sum()), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(f_b)[sl], np.asarray(f_s), rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(np.asarray(cn_b)[sl], np.asarray(cn_s), rtol=1e-10)


def test_padding_atoms_ignored():
    params = element_tables()
    pos, numbers = molecule(8, n=10)
    numbers_pad = numbers.copy()
    numbers_pad[3] = 0  # padding atom
    nm, num = nl_for(pos)
    e_pad, f_pad, cn_pad = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers_pad), A1, A2, S8,
        d3_params=params, neighbor_matrix=nm, output_dtype=None,
    )
    # equivalent system with atom 3 removed
    keep = np.arange(10) != 3
    nm2, num2 = nl_for(pos[keep])
    e_ref, f_ref, cn_ref = dftd3(
        jnp.asarray(pos[keep]), jnp.asarray(numbers[keep]), A1, A2, S8,
        d3_params=params, neighbor_matrix=nm2, output_dtype=None,
    )
    np.testing.assert_allclose(float(e_pad.sum()), float(e_ref.sum()), rtol=1e-10)
    assert float(jnp.abs(f_pad[3]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(f_pad)[keep], np.asarray(f_ref), rtol=1e-8, atol=1e-13)


def test_s5_smoothing_window():
    params = element_tables()
    pos, numbers = molecule(9)
    nm, num = nl_for(pos)
    e_plain, _, _ = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, neighbor_matrix=nm, output_dtype=None,
    )
    e_smooth, f_s, _ = dftd3(
        jnp.asarray(pos), jnp.asarray(numbers), A1, A2, S8,
        d3_params=params, neighbor_matrix=nm,
        s5_smoothing_on=2.0, s5_smoothing_off=3.5, output_dtype=None,
    )
    # switching reduces |energy| (it truncates attractive tails)
    assert abs(float(e_smooth.sum())) < abs(float(e_plain.sum()))

    # forces still consistent with finite differences under smoothing
    def energy_at(p):
        e, _, _ = dftd3(
            jnp.asarray(p), jnp.asarray(numbers), A1, A2, S8,
            d3_params=params, neighbor_matrix=nm,
            s5_smoothing_on=2.0, s5_smoothing_off=3.5, output_dtype=None,
        )
        return float(e.sum())

    h = 1e-6
    dp = pos.copy(); dp[1, 0] += h
    dm = pos.copy(); dm[1, 0] -= h
    fd = -(energy_at(dp) - energy_at(dm)) / (2 * h)
    np.testing.assert_allclose(float(f_s[1, 0]), fd, rtol=5e-5, atol=1e-9)


def test_parameter_validation():
    rcov = np.zeros(ZMAX + 1)
    r4r2 = np.zeros(ZMAX + 1)
    with pytest.raises(ValueError):
        D3Parameters(rcov=rcov, r4r2=r4r2, c6ab=np.zeros((2, 2, 5, 5)),
                     cn_ref=np.zeros((2, 2, 5, 5)))
    with pytest.raises(ValueError):
        dftd3(jnp.zeros((2, 3)), jnp.asarray([1, 1]), A1, A2, S8,
              neighbor_matrix=jnp.zeros((2, 4), dtype=jnp.int32))
    params = element_tables()
    with pytest.raises(ValueError):
        dftd3(jnp.zeros((2, 3)), jnp.asarray([1, 1]), A1, A2, S8, d3_params=params)


def test_empty_system():
    params = element_tables()
    e, f, cn = dftd3(
        jnp.zeros((0, 3)), jnp.zeros((0,), dtype=jnp.int32), A1, A2, S8,
        d3_params=params, neighbor_matrix=jnp.zeros((0, 4), dtype=jnp.int32),
    )
    assert e.shape == (1,) and f.shape == (0, 3) and cn.shape == (0,)
