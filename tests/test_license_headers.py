# SPDX-License-Identifier: Apache-2.0
"""Every Python source file carries an SPDX license identifier.

Counterpart of the reference's ``test/_license/header_check.py``.
"""

import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN = ("nvalchemiops_tpu", "tests", "benchmarks", "examples")


def _py_files():
    out = []
    for top in SCAN:
        for dirpath, _, files in os.walk(os.path.join(ROOT, top)):
            out.extend(
                os.path.join(dirpath, f) for f in files if f.endswith(".py")
            )
    out.append(os.path.join(ROOT, "bench.py"))
    return sorted(out)


@pytest.mark.parametrize("path", _py_files(), ids=lambda p: os.path.relpath(p, ROOT))
def test_spdx_header(path):
    with open(path) as f:
        head = f.read(512)
    assert "SPDX-License-Identifier: Apache-2.0" in head, (
        f"{os.path.relpath(path, ROOT)} missing SPDX header"
    )
