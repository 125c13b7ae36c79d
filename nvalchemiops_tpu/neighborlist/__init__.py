# SPDX-License-Identifier: Apache-2.0
"""Neighbor-list subsystem (reference: nvalchemiops/neighborlist/__init__.py:16-74)."""

from nvalchemiops_tpu.neighborlist.neighborlist import neighbor_list  # noqa: F401
from nvalchemiops_tpu.neighborlist.naive import naive_neighbor_list  # noqa: F401
from nvalchemiops_tpu.neighborlist.batch_naive import (  # noqa: F401
    batch_naive_neighbor_list,
)
from nvalchemiops_tpu.neighborlist.naive_dual_cutoff import (  # noqa: F401
    naive_neighbor_list_dual_cutoff,
)
from nvalchemiops_tpu.neighborlist.batch_naive_dual_cutoff import (  # noqa: F401
    batch_naive_neighbor_list_dual_cutoff,
)
from nvalchemiops_tpu.neighborlist.cell_list import (  # noqa: F401
    CellList,
    allocate_cell_list,
    build_cell_list,
    cell_list,
    estimate_cell_list_sizes,
    query_cell_list,
)
from nvalchemiops_tpu.neighborlist.batch_cell_list import (  # noqa: F401
    BatchCellList,
    batch_build_cell_list,
    batch_cell_list,
    batch_query_cell_list,
    estimate_batch_cell_list_sizes,
)
from nvalchemiops_tpu.neighborlist.rebuild_detection import (  # noqa: F401
    cell_list_needs_rebuild,
    check_cell_list_rebuild_needed,
    check_neighbor_list_rebuild_needed,
    neighbor_list_needs_rebuild,
)
from nvalchemiops_tpu.neighborlist.neighbor_utils import (  # noqa: F401
    NeighborOverflowError,
    assert_max_neighbors,
    compute_naive_num_shifts,
    estimate_max_neighbors,
    get_neighbor_list_from_neighbor_matrix,
    prepare_batch_idx_ptr,
)

__all__ = [
    "neighbor_list",
    "naive_neighbor_list",
    "batch_naive_neighbor_list",
    "naive_neighbor_list_dual_cutoff",
    "batch_naive_neighbor_list_dual_cutoff",
    "CellList",
    "BatchCellList",
    "allocate_cell_list",
    "build_cell_list",
    "query_cell_list",
    "cell_list",
    "estimate_cell_list_sizes",
    "batch_build_cell_list",
    "batch_query_cell_list",
    "batch_cell_list",
    "estimate_batch_cell_list_sizes",
    "cell_list_needs_rebuild",
    "neighbor_list_needs_rebuild",
    "check_cell_list_rebuild_needed",
    "check_neighbor_list_rebuild_needed",
    "NeighborOverflowError",
    "assert_max_neighbors",
    "estimate_max_neighbors",
    "compute_naive_num_shifts",
    "get_neighbor_list_from_neighbor_matrix",
    "prepare_batch_idx_ptr",
]
