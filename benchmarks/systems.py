# SPDX-License-Identifier: Apache-2.0
"""Benchmark system builders (counterpart of reference benchmarks/systems.py).

Analytic structure generators for the benchmark and validation drivers:
charged ionic crystals (CsCl / rocksalt / zincblende / wurtzite — the same
families the reference's electrostatics tests and benchmark configs use,
reference benchmarks/systems.py:874-986, test_utils.py:33-80), neutral
cubic lattices (sc / bcc / fcc), random gases, a tiny analytic molecule
library, and batch collation (``combine_systems``,
reference benchmarks/systems.py:643-813, ``create_batch_systems`` :1112).

The reference's COD/SMILES dataset loaders (CrystalDataset /
MoleculeDataset, systems.py:417-642) require network access and external
chemistry packages; in this environment they are intentionally not
provided — every builder here is closed-form.

All outputs are plain numpy arrays in a dict; convert with ``jnp.asarray``
at the call site (keeps the builders importable without touching any
device).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "create_crystal_system",
    "create_ionic_crystal",
    "create_random_system",
    "create_molecular_system",
    "combine_systems",
    "create_batch_systems",
    "MOLECULES",
]

# conventional-cell fractional bases: (fractional position, sublattice id)
_CUBIC_BASES = {
    "simple_cubic": np.zeros((1, 3)),
    "bcc": np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
    "fcc": np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0],
                     [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]]),
}

# two-species ionic prototypes: (cation frac, anion frac) per conventional
# cubic cell; wurtzite is hexagonal and handled separately
_IONIC_BASES = {
    # CsCl (B2): interpenetrating simple cubics
    "cscl": (np.array([[0.0, 0.0, 0.0]]),
             np.array([[0.5, 0.5, 0.5]])),
    # rocksalt (B1): two fcc sublattices offset by (1/2, 0, 0)
    "rocksalt": (_CUBIC_BASES["fcc"],
                 (_CUBIC_BASES["fcc"] + [0.5, 0.0, 0.0]) % 1.0),
    # zincblende (B3): fcc + fcc offset by (1/4, 1/4, 1/4)
    "zincblende": (_CUBIC_BASES["fcc"],
                   (_CUBIC_BASES["fcc"] + [0.25, 0.25, 0.25]) % 1.0),
}


def create_crystal_system(num_atoms, lattice_type="fcc", lattice_constant=4.0,
                          jitter=0.0, seed=0, dtype=np.float32):
    """Neutral cubic crystal with ~``num_atoms`` atoms (trimmed exactly).

    ``lattice_type`` in {"simple_cubic", "bcc", "fcc"}.  Alternating +1/-1
    charges and C/O atomic numbers mirror the reference's convention
    (benchmarks/systems.py:946-952) so electrostatics benchmarks see a
    neutral, non-trivial charge pattern.  Returns dict with ``positions
    [N,3]``, ``atomic_numbers [N]``, ``atomic_charges [N]``, ``cell
    [3,3]``, ``pbc [3]``.
    """
    if lattice_type not in _CUBIC_BASES:
        raise ValueError(f"unknown lattice type: {lattice_type!r}")
    basis = _CUBIC_BASES[lattice_type]
    per_cell = len(basis)
    n_cells = int(np.ceil((num_atoms / per_cell) ** (1.0 / 3.0)))

    ijk = np.stack(np.meshgrid(*([np.arange(n_cells)] * 3), indexing="ij"),
                   -1).reshape(-1, 1, 3)
    frac = (ijk + basis[None]) / n_cells            # [cells, per_cell, 3]
    frac = frac.reshape(-1, 3)[:num_atoms]
    parity = (ijk.repeat(per_cell, axis=1).sum(-1)
              + np.arange(per_cell)[None, :]).reshape(-1)[:num_atoms] % 2

    cell = np.eye(3) * (n_cells * lattice_constant)
    pos = frac @ cell
    if jitter:
        rng = np.random.default_rng(seed)
        pos = pos + rng.uniform(-jitter, jitter, pos.shape)
    charges = np.where(parity == 0, 1.0, -1.0)
    charges[-1] -= charges.sum()                    # exact neutrality
    return {
        "positions": pos.astype(dtype),
        "atomic_numbers": np.where(parity == 0, 6, 8).astype(np.int32),
        "atomic_charges": charges.astype(dtype),
        "cell": cell.astype(dtype),
        "pbc": np.array([True, True, True]),
    }


def create_ionic_crystal(structure="cscl", n_rep=4, lattice_constant=4.0,
                         z_cation=55, z_anion=17, jitter=0.0, seed=0,
                         dtype=np.float32):
    """Charged two-species crystal: cscl / rocksalt / zincblende / wurtzite.

    These are the benchmark/validation families of the reference's
    electrostatics suite (test_utils.py:33-80); their Madelung sums are
    analytic oracles.  ``n_rep`` repeats the conventional cell per axis.
    """
    if structure == "wurtzite":
        a = lattice_constant
        c = a * np.sqrt(8.0 / 3.0)
        u = 3.0 / 8.0
        hex_cell = np.array([
            [a, 0.0, 0.0],
            [-0.5 * a, 0.5 * np.sqrt(3.0) * a, 0.0],
            [0.0, 0.0, c],
        ])
        cat = np.array([[1 / 3, 2 / 3, 0.0], [2 / 3, 1 / 3, 0.5]])
        an = cat + [0.0, 0.0, u]
        base_cell = hex_cell
    elif structure in _IONIC_BASES:
        cat, an = _IONIC_BASES[structure]
        base_cell = np.eye(3) * lattice_constant
    else:
        raise ValueError(f"unknown ionic structure: {structure!r}")

    ijk = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"),
                   -1).reshape(-1, 1, 3)
    frac_c = ((ijk + cat[None]) / n_rep).reshape(-1, 3)
    frac_a = ((ijk + an[None]) / n_rep).reshape(-1, 3)
    cell = base_cell * n_rep
    pos = np.concatenate([frac_c, frac_a]) @ cell
    nc, na = len(frac_c), len(frac_a)
    if jitter:
        rng = np.random.default_rng(seed)
        pos = pos + rng.uniform(-jitter, jitter, pos.shape)
    return {
        "positions": pos.astype(dtype),
        "atomic_numbers": np.r_[np.full(nc, z_cation), np.full(na, z_anion)]
        .astype(np.int32),
        "atomic_charges": np.r_[np.ones(nc), -np.ones(na)].astype(dtype),
        "cell": cell.astype(dtype),
        "pbc": np.array([True, True, True]),
    }


def create_random_system(num_atoms, density=0.05, periodic=True, seed=0,
                         zmax=16, dtype=np.float32):
    """Uniform random gas at ``density`` atoms/A^3 (ref systems.py:987-1061)."""
    rng = np.random.default_rng(seed)
    box = (num_atoms / density) ** (1.0 / 3.0)
    charges = rng.normal(size=num_atoms)
    charges -= charges.mean()
    return {
        "positions": rng.uniform(0.0, box, (num_atoms, 3)).astype(dtype),
        "atomic_numbers": rng.integers(1, zmax + 1, num_atoms).astype(np.int32),
        "atomic_charges": charges.astype(dtype),
        "cell": (np.eye(3) * box).astype(dtype),
        "pbc": np.array([periodic] * 3),
    }


# tiny analytic molecule library (Angstroms): enough for non-PBC smoke
# benchmarks without any chemistry package
MOLECULES = {
    "water": (np.array([8, 1, 1]),
              np.array([[0.0, 0.0, 0.119],
                        [0.0, 0.763, -0.477],
                        [0.0, -0.763, -0.477]])),
    "methane": (np.array([6, 1, 1, 1, 1]),
                np.array([[0.0, 0.0, 0.0],
                          [0.629, 0.629, 0.629],
                          [-0.629, -0.629, 0.629],
                          [-0.629, 0.629, -0.629],
                          [0.629, -0.629, -0.629]])),
    "benzene": (np.array([6] * 6 + [1] * 6),
                np.vstack([
                    [[1.397 * np.cos(t), 1.397 * np.sin(t), 0.0]
                     for t in np.linspace(0, 2 * np.pi, 6, endpoint=False)],
                    [[2.481 * np.cos(t), 2.481 * np.sin(t), 0.0]
                     for t in np.linspace(0, 2 * np.pi, 6, endpoint=False)],
                ])),
}


def create_molecular_system(name="water", box=20.0, seed=0, dtype=np.float32):
    """One molecule centered in a large non-periodic box
    (ref systems.py:814-873)."""
    if name not in MOLECULES:
        raise ValueError(
            f"unknown molecule {name!r}; available: {sorted(MOLECULES)}")
    numbers, pos = MOLECULES[name]
    rng = np.random.default_rng(seed)
    charges = rng.normal(0, 0.1, len(numbers))
    charges -= charges.mean()
    return {
        "positions": (pos + box / 2.0).astype(dtype),
        "atomic_numbers": numbers.astype(np.int32),
        "atomic_charges": charges.astype(dtype),
        "cell": (np.eye(3) * box).astype(dtype),
        "pbc": np.array([False, False, False]),
    }


def combine_systems(systems):
    """Concatenate systems into the batched layout (ref systems.py:643-813).

    Returns dict with concatenated ``positions`` / ``atomic_numbers`` /
    ``atomic_charges``, stacked per-system ``cell [B,3,3]`` and ``pbc``,
    plus ``batch_ptr [B+1]`` and ``batch_idx [N]`` (the layout every
    ``batch_*`` API here consumes).
    """
    counts = [len(s["positions"]) for s in systems]
    ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    batch_idx = np.repeat(np.arange(len(systems), dtype=np.int32), counts)
    return {
        "positions": np.concatenate([s["positions"] for s in systems]),
        "atomic_numbers": np.concatenate([s["atomic_numbers"] for s in systems]),
        "atomic_charges": np.concatenate([s["atomic_charges"] for s in systems]),
        "cell": np.stack([s["cell"] for s in systems]),
        "pbc": np.stack([s["pbc"] for s in systems]),
        "batch_ptr": ptr,
        "batch_idx": batch_idx,
    }


def create_batch_systems(num_systems, atoms_per_system, kind="crystal",
                         seed=0, **kwargs):
    """Batch of similar systems with per-system seeds (ref systems.py:1112)."""
    builders = {
        "crystal": lambda i: create_crystal_system(
            atoms_per_system, seed=seed + i, jitter=kwargs.get("jitter", 0.1),
            **{k: v for k, v in kwargs.items() if k != "jitter"}),
        "random": lambda i: create_random_system(
            atoms_per_system, seed=seed + i, **kwargs),
    }
    if kind not in builders:
        raise ValueError(f"unknown batch kind: {kind!r}")
    return combine_systems([builders[kind](i) for i in range(num_systems)])
