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

# Full-suite hardening (round-1 weak #1): very occasionally a full
# `pytest tests/` run segfaulted inside XLA *compilation* after ~300
# compiled programs (the crashing file always passes in isolation).  Two
# mitigations: (a) raise RLIMIT_STACK before the backend starts — glibc
# sizes new pthread stacks from the soft limit, and XLA's compile passes
# recurse deeply on large unrolled graphs; (b) clear JAX's executable /
# tracing caches every few hundred tests to bound compile-churn state.
import resource  # noqa: E402

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _bound_compile_churn():
    """Drop compiled-executable caches every 150 tests (see module note)."""
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % 150 == 0:
        jax.clear_caches()
