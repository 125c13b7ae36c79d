# SPDX-License-Identifier: Apache-2.0
"""Benchmark system builders: stoichiometry, neutrality, lattice geometry."""

import numpy as np
import pytest

from benchmarks import systems as S


def _min_image_dist(s):
    p, c = s["positions"].astype(np.float64), s["cell"].astype(np.float64)
    f = (p[None] - p[:, None]) @ np.linalg.inv(c)
    f -= np.round(f)
    d = f @ c
    return (np.sqrt((d ** 2).sum(-1)) + np.eye(len(p)) * 1e9).min()


@pytest.mark.parametrize("lat", ["simple_cubic", "bcc", "fcc"])
def test_cubic_crystal(lat):
    s = S.create_crystal_system(777, lat, lattice_constant=3.5)
    assert len(s["positions"]) == 777
    assert abs(float(s["atomic_charges"].sum())) < 1e-5
    assert s["pbc"].all()


@pytest.mark.parametrize("st,nn", [
    ("cscl", np.sqrt(3) / 2), ("rocksalt", 0.5),
    ("zincblende", np.sqrt(3) / 4), ("wurtzite", np.sqrt(3.0 / 8.0)),
])
def test_ionic_nearest_neighbor(st, nn):
    s = S.create_ionic_crystal(st, n_rep=3, lattice_constant=1.0)
    assert abs(float(s["atomic_charges"].sum())) < 1e-6
    np.testing.assert_allclose(_min_image_dist(s), nn, rtol=1e-5)


def test_random_and_molecules():
    s = S.create_random_system(321, density=0.03)
    assert len(s["positions"]) == 321
    assert abs(float(s["atomic_charges"].sum())) < 1e-4
    m = S.create_molecular_system("methane")
    assert len(m["positions"]) == 5 and not m["pbc"].any()
    with pytest.raises(ValueError):
        S.create_molecular_system("nope")
    with pytest.raises(ValueError):
        S.create_crystal_system(10, "hcp")


def test_combine_and_batch():
    b = S.create_batch_systems(3, 128, kind="crystal")
    assert b["batch_ptr"].tolist()[-1] == 384
    assert (np.bincount(b["batch_idx"]) == 128).all()
    assert b["cell"].shape == (3, 3, 3)
