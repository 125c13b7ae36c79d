# SPDX-License-Identifier: Apache-2.0
"""Probe: PME reciprocal stage breakdown at bench scale (110k atoms, 128^3)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from benchmarks.harness import measure, perturb_positions
from nvalchemiops_tpu import spline_windowed as sw
from nvalchemiops_tpu.interactions.electrostatics.pme import _pme_reciprocal_impl

dep = perturb_positions()
rng = np.random.default_rng(0)
n_rep, a = 48, 3.0
g = np.stack(np.meshgrid(*([np.arange(n_rep)] * 3), indexing="ij"), -1).reshape(-1, 3) * a
pos_np = g + rng.uniform(-0.2, 0.2, g.shape)
n = pos_np.shape[0]
pos = jnp.asarray(pos_np, jnp.float32)
cell = jnp.asarray(np.eye(3) * (n_rep * a), jnp.float32)
q = jnp.asarray(rng.normal(size=n), jnp.float32)
alpha = jnp.asarray([0.35], jnp.float32)
mesh_dims = (128, 128, 128)
print(f"N={n} mesh={mesh_dims}", flush=True)


def full(p):
    e, f, cg = _pme_reciprocal_impl(
        p, q, cell.reshape(1, 3, 3), alpha, mesh_dims, 4, None, True, False,
        None, None)
    return f

def energy_only(p):
    e, f, cg = _pme_reciprocal_impl(
        p, q, cell.reshape(1, 3, 3), alpha, mesh_dims, 4, None, False, False,
        None, None)
    return e

CAP = sw.mesh_tile_capacity(n, mesh_dims)

def tiles_only(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
    return t.smat

def tiles_grad(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP, need_grad=True)
    return t.smat

def spread_only(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
    return sw.windowed_spread(t, q)

def fft_pair(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP)
    m = sw.windowed_spread(t, q)
    mf = jnp.fft.rfftn(m, norm="backward")
    return jnp.fft.irfftn(mf, s=mesh_dims, norm="forward")

for name, fn, it in [("tiles(bin)", tiles_only, 6),
                     ("tiles(bin,grad)", tiles_grad, 6),
                     ("spread", spread_only, 6),
                     ("spread+fft+ifft", fft_pair, 6),
                     ("energy only", energy_only, 4), ("full E+F", full, 4)]:
    t = measure(fn, dep, (pos,), iters=it)
    print(f"{name:16s}: {t*1e3:7.2f} ms", flush=True)

# --- observed-capacity variants -----------------------------------------
CAP_OBS = sw.observed_tile_capacity(pos, cell, mesh_dims)
print(f"cap: safe={CAP} observed={CAP_OBS}", flush=True)


def full_obs(p):
    e, f, cg = _pme_reciprocal_impl(
        p, q, cell.reshape(1, 3, 3), alpha, mesh_dims, 4, None, True, False,
        None, None, tile_capacity=CAP_OBS)
    return f


def spread_obs(p):
    t = sw.build_mesh_tiles(p, cell, mesh_dims, 4, CAP_OBS)
    return sw.windowed_spread(t, q)


for name, fn, it in [("spread obs-cap", spread_obs, 6),
                     ("full E+F obs-cap", full_obs, 4)]:
    t = measure(fn, dep, (pos,), iters=it)
    print(f"{name:16s}: {t*1e3:7.2f} ms", flush=True)

# --- Mosaic gather engine (VMEM-resident windowed gather-grad) -----------
def full_pallas_gather(p):
    e, f, cg = _pme_reciprocal_impl(
        p, q, cell.reshape(1, 3, 3), alpha, mesh_dims, 4, None, True, False,
        None, None, tile_capacity=CAP_OBS, gather_engine="pallas")
    return f

t = measure(full_pallas_gather, dep, (pos,), iters=4)
print(f"full E+F obs-cap pallas-gather: {t*1e3:7.2f} ms", flush=True)
print("done2", flush=True)
