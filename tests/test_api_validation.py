# SPDX-License-Identifier: Apache-2.0
"""API contract / failure-state tests (reference pattern: pytest.raises
coverage of format exclusivity, shape validation, and error states —
test_dftd3.py:631-767, D3Parameters validation :242-416, test_types.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nvalchemiops_tpu.neighborlist import (
    NeighborOverflowError,
    assert_max_neighbors,
    naive_neighbor_list,
    neighbor_list,
)
from nvalchemiops_tpu.interactions.dispersion import dftd3, D3Parameters
from nvalchemiops_tpu.interactions.electrostatics import (
    coulomb_energy,
    ewald_real_space,
)
from nvalchemiops_tpu.spline import spline_spread
from nvalchemiops_tpu.grid import estimate_grid_geometry


@pytest.fixture()
def small_system():
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 6.0, (12, 3)))
    cell = jnp.asarray(np.eye(3) * 6.0)
    numbers = jnp.asarray(rng.integers(1, 3, 12), jnp.int32)
    q = jnp.asarray(rng.normal(size=12))
    nm, num, sh = naive_neighbor_list(pos, 2.5, pbc=np.array([True] * 3),
                                      cell=cell)
    return pos, cell, numbers, q, nm, sh


def test_invalid_neighbor_method():
    pos = jnp.zeros((4, 3))
    with pytest.raises(ValueError, match="method"):
        neighbor_list(pos, 1.0, method="warp")


def test_overflow_assertion():
    num = jnp.asarray([3, 5, 2], jnp.int32)
    nm_small = jnp.zeros((3, 4), jnp.int32)
    with pytest.raises(NeighborOverflowError):
        assert_max_neighbors(nm_small, num)
    assert_max_neighbors(jnp.zeros((3, 5), jnp.int32), num)  # boundary passes


def test_dftd3_format_exclusivity(small_system):
    pos, cell, numbers, _, nm, sh = small_system
    tables = dict(covalent_radii=jnp.ones(3), r4r2=jnp.ones(3),
                  c6_reference=jnp.ones((3, 3, 5, 5)),
                  coord_num_ref=jnp.zeros((3, 3, 5, 5)))
    with pytest.raises(ValueError, match="exactly one"):
        dftd3(pos, numbers, 0.4, 4.0, 1.5, **tables)
    with pytest.raises(ValueError, match="exactly one"):
        dftd3(pos, numbers, 0.4, 4.0, 1.5, **tables,
              neighbor_matrix=nm, neighbor_list=jnp.zeros((2, 1), jnp.int32))


def test_dftd3_virial_requires_pbc(small_system):
    pos, cell, numbers, _, nm, sh = small_system
    tables = dict(covalent_radii=jnp.ones(3), r4r2=jnp.ones(3),
                  c6_reference=jnp.ones((3, 3, 5, 5)),
                  coord_num_ref=jnp.zeros((3, 3, 5, 5)))
    with pytest.raises(ValueError, match="[Vv]irial"):
        dftd3(pos, numbers, 0.4, 4.0, 1.5, **tables,
              neighbor_matrix=nm, compute_virial=True)


def test_dftd3_shifts_required_with_cell(small_system):
    pos, cell, numbers, _, nm, _ = small_system
    tables = dict(covalent_radii=jnp.ones(3), r4r2=jnp.ones(3),
                  c6_reference=jnp.ones((3, 3, 5, 5)),
                  coord_num_ref=jnp.zeros((3, 3, 5, 5)))
    with pytest.raises(ValueError, match="shifts"):
        dftd3(pos, numbers, 0.4, 4.0, 1.5, **tables,
              cell=cell, neighbor_matrix=nm)


def test_d3_parameters_shape_validation():
    with pytest.raises(ValueError):
        D3Parameters(rcov=np.ones(4), r4r2=np.ones(5),
                     c6ab=np.ones((5, 5, 5, 5)), cn_ref=np.zeros((5, 5, 5, 5)))
    with pytest.raises(ValueError):
        D3Parameters(rcov=np.ones(5), r4r2=np.ones(5),
                     c6ab=np.ones((5, 5, 4, 4)), cn_ref=np.zeros((5, 5, 5, 5)))


def test_coulomb_format_required(small_system):
    pos, cell, numbers, q, nm, sh = small_system
    with pytest.raises(ValueError, match="xactly one"):
        coulomb_energy(pos, q, cell, 2.5)


def test_ewald_per_system_alpha_requires_batch(small_system):
    pos, cell, numbers, q, nm, sh = small_system
    with pytest.raises(ValueError, match="batch_idx"):
        ewald_real_space(pos, q, cell.reshape(1, 3, 3),
                         jnp.asarray([0.3, 0.4]),
                         neighbor_matrix=nm, neighbor_matrix_shifts=sh)


def test_spline_order_validation():
    pos = jnp.zeros((3, 3))
    vals = jnp.ones(3)
    cell = jnp.eye(3) * 4.0
    with pytest.raises(ValueError, match="order"):
        spline_spread(pos, vals, cell, (8, 8, 8), spline_order=7)


def test_grid_geometry_rejects_cutoff_above_box():
    cell = np.eye(3) * 5.0
    with pytest.raises(ValueError, match="radius"):
        estimate_grid_geometry(cell, np.array([True] * 3), 12.0, 100)


def test_neighbor_list_empty_and_single_atom():
    cell = jnp.asarray(np.eye(3) * 5.0)
    one = jnp.zeros((1, 3))
    nm, num, sh = naive_neighbor_list(one, 1.5, pbc=np.array([True] * 3),
                                      cell=cell)
    assert int(num[0]) == 0  # no self-pair at zero shift
    nm2, num2 = naive_neighbor_list(jnp.zeros((1, 3)), 1.5)
    assert int(num2[0]) == 0


def test_half_fill_halves_pairs(small_system):
    pos, cell, *_ = small_system
    nm_f, num_f, _ = naive_neighbor_list(pos, 2.5, pbc=np.array([True] * 3),
                                         cell=cell)
    nm_h, num_h, _ = naive_neighbor_list(pos, 2.5, pbc=np.array([True] * 3),
                                         cell=cell, half_fill=True)
    assert int(num_f.sum()) == 2 * int(num_h.sum())
