# SPDX-License-Identifier: Apache-2.0
"""DFT-D3 parameter-table construction in the reference data format.

Counterpart of the reference's table-extraction utility (reference
examples/dispersion/utils.py:281-640 ``extract_dftd3_parameters``), minus
the network download: this module parses *locally provided* copies of
Grimme's ``dftd3.f`` / ``pars.f`` Fortran sources into the
``{rcov, r4r2, c6ab, cn_ref}`` arrays the D3 kernels consume, and ships a
small committed slice of realistically structured tables for tests.

Format contract (established by the reference loader, utils.py:505-560):

- ``c6ab  [95, 95, 5, 5]`` — 0.0 where no reference compound exists for the
  (element pair, CN-grid point); symmetric as ``c6ab[j, i, q, p] ==
  c6ab[i, j, p, q]``.
- ``cn_ref[95, 95, 5, 5]`` — filled with **-1.0**, then
  ``cn_ref[z, partner, p, :] = cn(z, p)`` for partners 1..94 only; the
  partner-0 column stays at -1.  ``cn_ref[zi, zj, p, q]`` therefore depends
  only on ``(zi, p)`` for ``zj >= 1`` (element structure), and unavailable
  grid points carry the -1 sentinel — they are excluded from the
  interpolation by the ``c6ab != 0`` availability mask, never by value.
- ``rcov[95]`` (scaled covalent radii, Bohr) and ``r4r2[95]``
  (sqrt-scaled <r^4>/<r^2> expectation values) with index 0 as padding.

Real tables exercise structure the synthetic test tables cannot: variable
per-element reference counts (1-5), -1 CN sentinels, the padding column,
and non-separable C6 *values* under a separable availability mask.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "parse_dftd3_fortran",
    "build_d3_format_tables",
    "realistic_test_tables",
]

_ZMAX = 94


def _fortran_floats(text: str) -> list[float]:
    """All Fortran float literals in ``text`` (handles D/E exponents)."""
    toks = re.findall(r"[-+]?\d+\.\d*(?:[eEdD][-+]?\d+)?", text)
    return [float(t.lower().replace("d", "e")) for t in toks]


def _parse_data_block(source: str, name: str) -> np.ndarray:
    """Values of a Fortran ``data <name> / ... /`` statement.

    Comment lines (leading ``!`` or classic ``c`` column) are dropped;
    inline ``!`` comments are stripped.  Raises ``ValueError`` when the
    block is absent.
    """
    kept = []
    for ln in source.splitlines():
        s = ln.strip()
        if s.startswith("!") or re.match(r"^[cC*]\s", ln):
            continue
        kept.append(ln.split("!", 1)[0])
    text = "\n".join(kept)
    m = re.search(rf"data\s+{name}\s*/(.*?)/", text,
                  re.IGNORECASE | re.DOTALL)
    if m is None:
        raise ValueError(f"no 'data {name} / ... /' block found")
    return np.asarray(_fortran_floats(m.group(1)), dtype=np.float64)


def _decode_pair_index(code: int) -> tuple[int, int]:
    """Grimme's packed (element, CN-grid index): z + 100 * (p - 1)."""
    p, z = divmod(code - 1, 100)
    return z + 1, p + 1


def parse_dftd3_fortran(dftd3_f: str, pars_f: str) -> dict[str, np.ndarray]:
    """Build the D3 tables from Grimme's Fortran sources (local copies).

    Parameters are the *contents* of ``dftd3.f`` (for the ``rcov`` and
    ``r2r4`` data blocks) and ``pars.f`` (the C6 reference records, each
    ``[c6, code_i, code_j, cn_i, cn_j]``).  Returns the reference-format
    dict ``{rcov, r4r2, c6ab, cn_ref}`` (float32, shapes above).

    Reference counterpart: examples/dispersion/utils.py:281-640 (which
    additionally downloads the archive; this library is offline-only — pass
    file contents you obtained yourself).
    """
    rcov_raw = _parse_data_block(dftd3_f, "rcov")[:_ZMAX]
    r2r4_raw = _parse_data_block(dftd3_f, "r2r4")[:_ZMAX]
    if rcov_raw.size == 0 or r2r4_raw.size == 0:
        raise ValueError("empty rcov/r2r4 data blocks")

    # dftd3.f applies k2 = 4/3 and Angstrom->Bohr to rcov, and
    # r4r2[z] = sqrt(0.5 * r2r4[z] * sqrt(z)) to r2r4, before use.
    # Blocks shorter than 94 elements (truncated sources) fill a prefix.
    autoang = 0.52917726
    rcov = np.zeros(_ZMAX + 1, dtype=np.float32)
    r4r2 = np.zeros(_ZMAX + 1, dtype=np.float32)
    nr, n4 = rcov_raw.size, r2r4_raw.size
    rcov[1:nr + 1] = (4.0 / 3.0) * rcov_raw / autoang
    r4r2[1:n4 + 1] = np.sqrt(
        0.5 * r2r4_raw * np.sqrt(np.arange(1, n4 + 1, dtype=np.float64)))

    vals = _fortran_floats(
        "\n".join(ln.split("!", 1)[0] for ln in pars_f.splitlines()
                  if "pars" not in ln.lower() or "(/" in ln))
    n_rec = len(vals) // 5
    rec = np.asarray(vals[: n_rec * 5], dtype=np.float64).reshape(n_rec, 5)

    entries = []
    for c6, ci, cj, cni, cnj in rec:
        zi, p = _decode_pair_index(int(round(ci)))
        zj, q = _decode_pair_index(int(round(cj)))
        if not (1 <= zi <= _ZMAX and 1 <= zj <= _ZMAX
                and 1 <= p <= 5 and 1 <= q <= 5):
            continue
        entries.append((zi, zj, p - 1, q - 1, float(c6),
                        float(cni), float(cnj)))
    return build_d3_format_tables(entries, rcov=rcov, r4r2=r4r2)


def build_d3_format_tables(entries, rcov=None, r4r2=None,
                           zmax: int = _ZMAX) -> dict[str, np.ndarray]:
    """Assemble ``{rcov, r4r2, c6ab, cn_ref}`` from C6 reference records.

    ``entries``: iterable of ``(zi, zj, p, q, c6, cn_i, cn_j)`` with 0-based
    grid indices ``p, q``.  Reproduces the reference loader's fill semantics
    exactly (utils.py:505-560): symmetric C6 assignment, first-win CN
    values, -1.0 ``cn_ref`` fill, and the partner-0 column left at -1.
    """
    zi1 = zmax + 1
    c6ab = np.zeros((zi1, zi1, 5, 5), dtype=np.float32)
    cn_ref = np.full((zi1, zi1, 5, 5), -1.0, dtype=np.float32)
    cn_of: dict[int, dict[int, float]] = {}

    for zi, zj, p, q, c6, cn_i, cn_j in entries:
        c6ab[zi, zj, p, q] = c6
        c6ab[zj, zi, q, p] = c6
        cn_of.setdefault(zi, {}).setdefault(p, cn_i)
        cn_of.setdefault(zj, {}).setdefault(q, cn_j)

    for z, by_p in cn_of.items():
        for p, cn in by_p.items():
            cn_ref[z, 1:, p, :] = cn

    if rcov is None:
        rcov = np.zeros(zi1, dtype=np.float32)
    if r4r2 is None:
        r4r2 = np.zeros(zi1, dtype=np.float32)
    return {
        "rcov": np.asarray(rcov, np.float32),
        "r4r2": np.asarray(r4r2, np.float32),
        "c6ab": c6ab,
        "cn_ref": cn_ref,
    }


# --------------------------------------------------------------------------
# Committed realistic slice (H, He, C, N, O)
# --------------------------------------------------------------------------
#
# Structure (reference-CN grids per element, i.e. which (p, q) points exist)
# follows the published Grimme DFT-D3 data exactly: H has 2 reference
# systems, He 1, C 5, N 4, O 3.  The numeric values are approximate
# transcriptions of the published tables (free-atom C6 coefficients,
# covalent radii, <r^4>/<r^2> values) — close enough to be physically
# sensible, but NOT authoritative: for production use, parse the real
# ``pars.f`` via :func:`parse_dftd3_fortran`.  Tests built on this slice
# validate *format handling* (element structure, -1 sentinels, availability
# masking, variable reference counts) and engine cross-consistency, with
# self-generated frozen regressions — the same role the reference's dummy
# tables play in its own test suite (reference test conftest.py:38-160).

#: per-element reference coordination numbers (0-based grid order)
_REF_CN = {
    1: [0.9118, 0.0],                          # H: H2, free atom
    2: [0.0],                                  # He: free atom only
    6: [0.0, 0.9868, 1.9985, 2.9987, 3.9844],  # C
    7: [0.0, 0.9944, 2.0143, 2.9903],          # N
    8: [0.0, 0.9925, 1.9887],                  # O
}

#: free-atom (CN grid point with cn == 0) homo-pair C6 values, a.u.
_C6_FREE = {1: 7.59, 2: 1.56, 6: 49.11, 7: 25.27, 8: 15.51}

#: approximate scaled covalent radii (Bohr; 4/3 x covalent radius)
_RCOV = {1: 0.806, 2: 0.928, 6: 1.889, 7: 1.764, 8: 1.638}

#: approximate sqrt-scaled <r^4>/<r^2> expectation values
_R4R2 = {1: 2.007, 2: 1.567, 6: 3.448, 7: 3.100, 8: 2.869}


def realistic_test_tables(dtype=np.float32) -> dict[str, np.ndarray]:
    """The committed H/He/C/N/O slice in the reference data format.

    C6 values: geometric-mean combination of the free-atom coefficients,
    damped multiplicatively toward higher coordination (each CN step
    reduces C6 by ~12%, the qualitative trend of the real tables) plus a
    small deterministic non-separable ripple so tests cannot silently rely
    on value separability — only the *availability* pattern is separable,
    as in the real data.
    """
    entries = []
    elems = sorted(_REF_CN)
    for zi in elems:
        for zj in elems:
            for p, cn_i in enumerate(_REF_CN[zi]):
                for q, cn_j in enumerate(_REF_CN[zj]):
                    base = np.sqrt(_C6_FREE[zi] * _C6_FREE[zj])
                    damp = 0.88 ** (cn_i + cn_j)
                    ripple = 1.0 + 0.05 * np.sin(3.1 * zi + 1.7 * zj
                                                 + 2.3 * p + 0.9 * q)
                    entries.append((zi, zj, p, q, base * damp * ripple,
                                    cn_i, cn_j))
    zmax = max(elems)
    rcov = np.zeros(zmax + 1, dtype=np.float64)
    r4r2 = np.zeros(zmax + 1, dtype=np.float64)
    for z in elems:
        rcov[z] = _RCOV[z]
        r4r2[z] = _R4R2[z]
    out = build_d3_format_tables(entries, rcov=rcov, r4r2=r4r2, zmax=zmax)
    return {k: np.asarray(v, dtype) for k, v in out.items()}
