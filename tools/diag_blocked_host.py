"""Host-side (numpy) analysis of blocked-scan culling granularity.

For the 20k-triangle torus scene at 256^2 with 64x32 pixel tiles:
  - per-tile count of blocks taken by the kernel's any-lane slab test
    (what the shipped kernel scans for PRIMARY rays, no t-prune),
  - per-RAY mean block count (the ideal granularity floor),
  - per-tile count from a conservative compile-time frustum test
    (what a host prelist would scan).

Also shadow-corridor stats: from brute-force primary hits, per (tile,
light) the any-lane slab count for shadow rays vs a hull(hit-box, light)
box-overlap count (the runtime scalar-interval culling candidate).
"""

from __future__ import annotations

import numpy as np

from opencl_montecarlo_path_tracing_tpu.core.camera import make_camera
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from tools.diag_blocked import big_scene

SIZE = 256
TW, TH = M._TW, M._TH


def primary_rays(size):
    """All-pixel primary rays with zero jitter (numpy, (size*size, 3))."""
    cam = make_camera(z_sign=-1.0)
    up = np.asarray(cam.up, np.float64)
    right = np.asarray(cam.right, np.float64)
    eyo = np.asarray(cam.eye_offset, np.float64)
    pos = np.asarray(cam.pos, np.float64)
    jj, ii = np.mgrid[0:size, 0:size].astype(np.float64)
    ax = ii.ravel() + 0.5
    ay = jj.ravel() + 0.5
    d = 16.0 * (up[None, :] * ax[:, None] + right[None, :] * ay[:, None]
                + eyo[None, :])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(pos, d.shape)
    return o, d


def slab_hits(o, d, aabbs):
    """(R, B) bool: slab test per (ray, block)."""
    inv = 1.0 / d                                    # (R, 3)
    lo = aabbs[:, :3]                                # (B, 3)
    hi = aabbs[:, 3:]
    t0 = (lo[None] - o[:, None]) * inv[:, None]      # (R, B, 3)
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    tmin = np.minimum(t0, t1).max(axis=2)
    tmax = np.maximum(t0, t1).min(axis=2)
    return (tmax >= tmin) & (tmax >= 0.01)


def main():
    scn = big_scene()
    tblT, aabbs, aabbs_m = M._tri_blocks(scn)
    nb = aabbs.shape[0]
    live = aabbs[:, 0] <= aabbs[:, 3]
    print(f"blocks: {nb} ({live.sum()} live)")

    o, d = primary_rays(SIZE)
    hits = slab_hits(o, d, aabbs)                     # (R, B)
    per_ray = hits.sum(axis=1)
    print(f"primary per-ray blocks: mean {per_ray.mean():.1f}, "
          f"p50 {np.percentile(per_ray, 50):.0f}, "
          f"max {per_ray.max()}")

    # tile layout matches the kernel: tile covers [tx*TW,(tx+1)*TW) x
    # [ty*TH,(ty+1)*TH)
    tiles_x, tiles_y = SIZE // TW, SIZE // TH
    jj, ii = np.mgrid[0:SIZE, 0:SIZE]
    tile_id = (jj // TH) * tiles_x + (ii // TW)
    tile_id = tile_id.ravel()
    n_tiles = tiles_x * tiles_y
    taken = np.zeros((n_tiles, nb), bool)
    np.logical_or.at(taken, tile_id, hits)
    per_tile = taken.sum(axis=1)
    print(f"primary any-lane per-tile blocks: mean {per_tile.mean():.1f}, "
          f"dist {sorted(per_tile.tolist())}")

    # shadow corridors: brute-force closest hit (floor + torus AABB proxy:
    # use the real triangles via the packed table)
    # cheap approx: hit point = floor hit or block-AABB entry; for stats use
    # the exact triangle mesh via ops.intersect on CPU JAX? Keep numpy:
    # floor z=0 plane hit only where d_z < 0; torus pixels approximated by
    # rays whose per-ray block count > 0 using slab tmin of nearest block.
    t_floor = np.where(d[:, 2] < 0, -o[:, 2] / d[:, 2], 1e9)
    x = o + d * np.minimum(t_floor, 1e6)[:, None]
    lights = np.asarray(scn.lights)[:, :3]
    for li, L in enumerate(lights):
        sd = L[None] - x
        nrm = np.linalg.norm(sd, axis=1, keepdims=True)
        sdn = sd / np.maximum(nrm, 1e-9)
        sh = slab_hits(x + 1e-3 * sdn, sdn, aabbs)
        # limit to segment: tmin <= |L - x|  (approx: drop it, conservative)
        pr = sh.sum(axis=1)
        taken_s = np.zeros((n_tiles, nb), bool)
        np.logical_or.at(taken_s, tile_id, sh)
        pt = taken_s.sum(axis=1)
        print(f"shadow L{li} (floor-hit proxy): per-ray mean {pr.mean():.1f} "
              f"per-tile any-lane mean {pt.mean():.1f} "
              f"dist {sorted(pt.tolist())}")
        # hull(tile hit box, light) vs block AABB overlap count
        cnt = []
        for t in range(n_tiles):
            xs = x[tile_id == t]
            xs = xs[np.abs(xs).max(axis=1) < 50]     # clip horizon
            if len(xs) == 0:
                cnt.append(0)
                continue
            hlo = np.minimum(xs.min(axis=0), L)
            hhi = np.maximum(xs.max(axis=0), L)
            ov = ((aabbs[:, :3] <= hhi) & (aabbs[:, 3:] >= hlo)).all(axis=1)
            cnt.append(int((ov & live).sum()))
        print(f"  hull-box per-tile: dist {sorted(cnt)}")


if __name__ == "__main__":
    main()
