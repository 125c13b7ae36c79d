# SPDX-License-Identifier: Apache-2.0
"""Probe: unmaterialized add-tree full-space stencil sweep (engine='fuse')."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu.stencil import (
    build_stencil_grid, choose_stencil_geometry,
    stencil_coulomb_energy_forces, stencil_coordination_numbers,
    stencil_cn_chain_forces,
)

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = 48, 3.0
gpts = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"),
                -1).reshape(-1, 3) * a
pos_np = gpts + rng.uniform(-0.2, 0.2, gpts.shape)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
pbc = np.array([True] * 3)
cutoff = 9.0
alpha = 0.35
charges = jnp.asarray(rng.normal(size=n), jnp.float32)
rcov_a = jnp.asarray(rng.uniform(0.6, 1.2, n), jnp.float32)
decn_a = jnp.asarray(rng.normal(size=n), jnp.float32)

geo = choose_stencil_geometry(pos, cell, pbc, cutoff)
sdims, srad, sorigin, socc = geo
sorigin = sorigin if sorigin.any() else None
print(f"N={n} stencil {sdims} r={srad}", flush=True)


def build_s(p):
    return build_stencil_grid(p, cell, pbc, sdims, srad, origin=sorigin)


for name, fn in [
    ("coulomb fuse", lambda p: stencil_coulomb_energy_forces(
        build_s(p), charges, cutoff, alpha, engine="fuse")[1]),
    ("cn fuse     ", lambda p: stencil_coordination_numbers(
        build_s(p), rcov_a, cutoff, engine="fuse")),
    ("chain fuse  ", lambda p: stencil_cn_chain_forces(
        build_s(p), rcov_a, decn_a, cutoff, engine="fuse")),
]:
    t = measure(fn, dep, (pos,), iters=4)
    print(f"{name}: {t*1e3:.2f} ms (incl build)", flush=True)
print("done", flush=True)
