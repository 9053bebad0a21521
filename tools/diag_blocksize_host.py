"""Host sim: does a smaller Morton block size cut scanned triangle rows?

The blocked scan's culling granularity is the any-lane-per-tile union of
block slab hits; a taken block costs its FULL row count in scans + one
DMA.  Smaller blocks cull finer (fewer wasted rows per taken block) but
cost more prepass box tests, more DMAs, and a bigger SMEM AABB table
(24 B/block against the ~32 KB budget - the binding constraint that
forces the stream tier past 65k triangles).

For bs in {32, 64, 128} on the 20k and 65k tori at 512^2 (64x32 tiles,
primary rays, no t-prune - matching the shipped single-segment prepass):
  - scanned rows/frame = sum_tiles taken_blocks * bs
  - DMAs/frame = sum_tiles taken_blocks
  - per-RAY union rows (the floor any per-tile design cannot beat)
  - SMEM AABB bytes (24 * n_blocks)
"""

from __future__ import annotations

import numpy as np

from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import _tri_table
from opencl_montecarlo_path_tracing_tpu.scene.builtin import large_mesh_scene
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from tools.diag_blocked_host import primary_rays, slab_hits

SIZE = 512
TW, TH = M._TW, M._TH


def block_aabbs(scn, bs: int) -> np.ndarray:
    """Morton-sorted per-block AABBs at block size bs (the _tri_blocks
    recipe with _TRI_BLOCK parameterized; no macro padding)."""
    tbl = _tri_table(scn)
    nt = tbl.shape[0]
    v0 = tbl[:, 0:3]
    v1 = v0 + tbl[:, 3:6]
    v2 = v0 + tbl[:, 6:9]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    c = 0.5 * (lo + hi)
    smin = c.min(axis=0)
    ext = np.maximum(c.max(axis=0) - smin, 1e-30)
    q = np.clip((c - smin) / ext * 1023.0, 0.0, 1023.0).astype(np.uint64)
    code = (M._part1by2(q[:, 0]) | (M._part1by2(q[:, 1]) << np.uint64(1))
            | (M._part1by2(q[:, 2]) << np.uint64(2)))
    order = np.argsort(code, kind="stable")
    lo, hi = lo[order], hi[order]
    nb = -(-nt // bs)
    out = np.empty((nb, 6), np.float32)
    for b in range(nb):
        s, e = b * bs, min((b + 1) * bs, nt)
        blo = lo[s:e].min(axis=0)
        bhi = hi[s:e].max(axis=0)
        pad = 1e-3 * (bhi - blo) + 1e-4
        out[b, :3] = blo - pad
        out[b, 3:] = bhi + pad
    return out


def main():
    o, d = primary_rays(SIZE)
    tiles_x = SIZE // TW
    jj, ii = np.mgrid[0:SIZE, 0:SIZE]
    tile_id = ((jj // TH) * tiles_x + (ii // TW)).ravel()
    n_tiles = (SIZE // TW) * (SIZE // TH)

    for tag, nm in (("20k", (144, 72)), ("65k", (256, 128))):
        scn = prep_scene(large_mesh_scene(*nm))
        for bs in (32, 64, 128):
            aabbs = block_aabbs(scn, bs)
            nb = aabbs.shape[0]
            hits = np.zeros((SIZE * SIZE, nb), bool)
            # chunk rays to bound the (R, B, 3) temporary (f32: the sim
            # compares granularities, not exact float behavior)
            a32 = aabbs.astype(np.float32)
            o32 = o.astype(np.float32)
            d32 = d.astype(np.float32)
            step = 4096
            for s in range(0, SIZE * SIZE, step):
                hits[s:s + step] = slab_hits(o32[s:s + step],
                                             d32[s:s + step], a32)
            per_ray_rows = hits.sum(axis=1) * bs
            taken = np.zeros((n_tiles, nb), bool)
            np.logical_or.at(taken, tile_id, hits)
            rows = int(taken.sum()) * bs
            print(f"{tag} bs={bs:3d}: blocks {nb:5d} "
                  f"(SMEM {nb * 24 / 1024:5.1f} KB)  "
                  f"tile-union rows/frame {rows / 1e6:7.2f} M  "
                  f"DMAs {int(taken.sum()):6d}  "
                  f"per-ray rows mean {per_ray_rows.mean():7.0f}",
                  flush=True)


if __name__ == "__main__":
    main()
