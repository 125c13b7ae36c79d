# SPDX-License-Identifier: Apache-2.0
"""Test harness configuration.

Correctness tests run on the CPU backend with a virtual 8-device mesh and
float64 enabled — the TPU analogue of the reference's CPU test path (the
reference runs its full Warp kernel suite on CPU as the de-facto fake
backend; SURVEY.md §4).  Performance is benchmarked separately on the real
TPU chip by bench.py.

Note: the axon TPU plugin ignores the ``JAX_PLATFORMS`` environment variable,
so the platform must be forced through ``jax.config``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
