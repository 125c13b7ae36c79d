# SPDX-License-Identifier: Apache-2.0
"""Shared neighbor-utility primitives."""

import numpy as np
import jax.numpy as jnp


def test_bucket_ranks_fallback_path_matches_packed():
    """The >= 2^31 product fallback (multi-operand sort) == the packed path.

    At-scale builds (e.g. 524k atoms x 26^3 x cap buckets) overflow the
    packed int32 key; the fallback must produce identical ranks.
    """
    from nvalchemiops_tpu.neighborlist.neighbor_utils import bucket_ranks

    rng = np.random.default_rng(3)
    n = 1500
    lin_np = rng.integers(0, 40, n).astype(np.int32)
    lin = jnp.asarray(lin_np)
    rank_packed, cmax_packed = bucket_ranks(lin, 40)           # packed path
    # same keys, bucket count inflated so num_buckets * n >= 2^31
    rank_fb, cmax_fb = bucket_ranks(lin, 2_000_000)            # fallback
    np.testing.assert_array_equal(np.asarray(rank_fb),
                                  np.asarray(rank_packed))
    assert int(cmax_fb) == int(cmax_packed)
