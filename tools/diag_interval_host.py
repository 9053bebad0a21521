"""Host-side check: how conservative is an INTERVAL-frustum block test
vs the shipped per-lane any-lane union?

The prepass costs ~16 ms/frame at 65k (tools/diag_blocked_parts.py):
per-block SMEM scalar broadcasts into per-lane vector slab tests.  An
interval test reduces each bundle to origin/direction/t intervals and
tests 128 blocks per vector op - but intervals over a whole tile take a
SUPERSET of blocks.  This tool measures the inflation on primary rays
of the PT_DIAG_MESH torus at 512^2: per-tile taken blocks, any-lane vs
interval (with per-component sign-split fallback), both with the
pre-state floor t prune.
"""

from __future__ import annotations

import os

import numpy as np

from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from tools.diag_blocked import big_scene
from tools.diag_blocked_host import primary_rays

SIZE = 512
_MESH = tuple(int(x) for x in os.environ.get("PT_DIAG_MESH", "256,128")
              .split(","))


def main():
    scn = big_scene(*_MESH)
    tblT, aabbs, aabbs_m = M._tri_blocks(scn)
    nb = aabbs.shape[0]
    o, d = primary_rays(SIZE)
    TW, TH = M._TW, M._TH
    tiles_x = SIZE // TW
    jj, ii = np.mgrid[0:SIZE, 0:SIZE]
    tile_id = ((jj // TH) * tiles_x + (ii // TW)).ravel()
    n_tiles = tiles_x * (SIZE // TH)

    t_pre = np.where(d[:, 2] < 0, -o[:, 2] / d[:, 2], 1e9)

    # per-lane any-lane union (shipped semantics, pre-state prune),
    # chunked per tile: the dense (rays, blocks, 3) temporary is ~13 GB
    # at 262k triangles
    inv = 1.0 / d
    lo, hi = aabbs[:, :3].astype(np.float64), aabbs[:, 3:].astype(np.float64)
    anylane = np.zeros((n_tiles, nb), bool)
    for t in range(n_tiles):
        sel = tile_id == t
        t0 = (lo[None] - o[sel, None]) * inv[sel, None]
        t1 = (hi[None] - o[sel, None]) * inv[sel, None]
        tmin = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)
        tmax = np.maximum(t0, t1).min(axis=2)
        lane = ((tmax >= tmin) & (tmax >= 1e-2)
                & (tmin <= t_pre[sel, None] * 1.001))
        anylane[t] = lane.any(axis=0)

    # interval test per tile
    interval = np.zeros((n_tiles, nb), bool)
    for t in range(n_tiles):
        sel = tile_id == t
        O, D = o[sel], d[sel]
        olo, ohi = O.min(axis=0), O.max(axis=0)
        dlo, dhi = D.min(axis=0), D.max(axis=0)
        th = float((np.minimum(t_pre[sel], 1e9)).max() * 1.001)
        ent = np.full(nb, -1e30)
        exi = np.full(nb, 1e30)
        for c in range(3):
            if dlo[c] * dhi[c] <= 0:
                continue            # sign-mixed: no constraint
            ilo, ihi = sorted((1.0 / dlo[c], 1.0 / dhi[c]))
            A = np.stack([lo[:, c] - ohi[c], lo[:, c] - olo[c]])
            B = np.stack([hi[:, c] - ohi[c], hi[:, c] - olo[c]])
            pa = np.stack([A * ilo, A * ihi])      # (2, 2, nb)
            pb = np.stack([B * ilo, B * ihi])
            t0lo, t0hi = pa.min(axis=(0, 1)), pa.max(axis=(0, 1))
            t1lo, t1hi = pb.min(axis=(0, 1)), pb.max(axis=(0, 1))
            ent = np.maximum(ent, np.minimum(t0lo, t1lo))
            exi = np.minimum(exi, np.maximum(t0hi, t1hi))
        ent = np.maximum(ent, 0.0)
        interval[t] = (exi >= ent) & (exi >= 1e-2) & (ent <= th)

    a, b = int(anylane.sum()), int(interval.sum())
    print(f"mesh {_MESH}: {nb} blocks, {n_tiles} tiles")
    print(f"taken block-scans/frame: any-lane {a}, interval {b} "
          f"({b / max(a, 1):.2f}x)")
    miss = anylane & ~interval
    print(f"interval misses any-lane blocks (MUST be 0): {int(miss.sum())}")


if __name__ == "__main__":
    main()
