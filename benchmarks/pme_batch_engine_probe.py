# SPDX-License-Identifier: Apache-2.0
"""Probe: batch PME engine matrix at 64 x 2000 / 32^3 (round 3).

After the gather-form MeshTiles build (aid slot->atom map), re-measure the
batched windowed pipeline and the Mosaic spread/gather engine variants to
pick the batch default.  The H100 reference row is 5.76 ms (energies).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.harness import measure, perturb_positions  # noqa: E402
from nvalchemiops_tpu import spline_windowed as sw  # noqa: E402
from nvalchemiops_tpu.interactions.electrostatics.pme import (  # noqa: E402
    batch_pme_reciprocal,
)

dep = perturb_positions()
rng = np.random.default_rng(5)
B, npa, box = 64, 2000, 27.0
mesh_dims = (32, 32, 32)
alpha = 0.35

pos_b = jnp.asarray(rng.uniform(0, box, (B, npa, 3)), jnp.float32)
q_b = jnp.asarray(rng.normal(size=(B, npa)), jnp.float32)
cell = jnp.asarray(np.eye(3) * box, jnp.float32)

tile_cap = max(sw.observed_tile_capacity(pos_b[i], cell, mesh_dims)
               for i in range(B)) + 8
print(f"B={B} npa={npa} mesh={mesh_dims} tile_cap={tile_cap}", flush=True)

engine_matrix = os.environ.get("PROBE_TILE_ONLY", "0") != "1"
for forces in (False, True) if engine_matrix else ():
    for sp_eng, ga_eng in (("xla", "xla"), ("pallas", "xla"),
                           ("xla", "pallas"), ("pallas", "pallas")):
        def fn(p, f=forces, se=sp_eng, ge=ga_eng):
            out = batch_pme_reciprocal(
                p, q_b, cell, alpha, mesh_dims, compute_forces=f,
                tile_capacity=tile_cap, spread_engine=se, gather_engine=ge)
            return out[1] if f else out
        try:
            t = measure(fn, dep, (pos_b,), iters=4)
            print(f"E{'+F' if forces else '  '} spread={sp_eng:6s} "
                  f"gather={ga_eng:6s}: {t*1e3:7.2f} ms", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"E{'+F' if forces else '  '} spread={sp_eng:6s} "
                  f"gather={ga_eng:6s}: failed "
                  f"{type(exc).__name__}: {exc}"[:240], flush=True)

# larger tiles shrink the W^2 expansion intermediates (tile 8: [t, cap,
# 196] x 3 per system ~ 230 MB over the batch; tile 16: [8, cap, 400])
for tile in (16, 32):
    try:
        cap_t = max(sw.observed_tile_capacity(pos_b[i], cell, mesh_dims,
                                              tile=tile) for i in range(8))
        cap_t = ((cap_t + 8 + 31) // 32) * 32
        for forces in (False, True):
            def fn(p, f=forces, tl=tile, c=cap_t):
                out = batch_pme_reciprocal(
                    p, q_b, cell, alpha, mesh_dims, compute_forces=f,
                    tile_capacity=c, tile=tl)
                return out[1] if f else out
            t = measure(fn, dep, (pos_b,), iters=4)
            print(f"E{'+F' if forces else '  '} tile={tile:2d} cap={cap_t}: "
                  f"{t*1e3:7.2f} ms", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"tile={tile}: failed {type(exc).__name__}: {exc}"[:240],
              flush=True)

# engine-variant parity at this config
e_x, f_x = batch_pme_reciprocal(pos_b, q_b, cell, alpha, mesh_dims,
                                compute_forces=True, tile_capacity=tile_cap)
e_p, f_p = batch_pme_reciprocal(pos_b, q_b, cell, alpha, mesh_dims,
                                compute_forces=True, tile_capacity=tile_cap,
                                spread_engine="pallas",
                                gather_engine="pallas")
print(f"pallas-vs-xla E rel: "
      f"{float(jnp.abs(e_p - e_x).max() / jnp.abs(e_x).max()):.3e}",
      flush=True)
print(f"pallas-vs-xla F rel: "
      f"{float(jnp.abs(f_p - f_x).max() / jnp.abs(f_x).max()):.3e}",
      flush=True)
print("done", flush=True)
