"""Host-side (numpy) estimate of what a SEGMENTED re-prune would save.

The blocked scan builds its take-list ONCE per trace, so the t-prune uses
only the pre-triangle state (floor/spheres): a ray through the torus keeps
every block along its corridor until the floor, even though the real hit
is on the first surface.  Near-to-far macro ordering makes a segmented
scan possible: scan segment 0, update the running t, re-prune the
remaining segments with the (much smaller) updated t, and so on.

This tool simulates, per tile (the kernel's any-lane union), the taken
block count for S = 1 (shipped), 2, 4, 8 segments, and the perfect-prune
lower bound (t = final hit t everywhere), on primary rays of the 65k (or
PT_DIAG_MESH) torus at 512^2.  Pixels are subsampled 4x per axis, so the
union is a slight underestimate - consistent across variants.
"""

from __future__ import annotations

import os

import numpy as np

from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from tools.diag_blocked import big_scene
from tools.diag_blocked_host import primary_rays

SIZE = 512
SUB = int(os.environ.get("PT_DIAG_SUB", "4"))   # pixel subsample per axis
_MESH = tuple(int(x) for x in os.environ.get("PT_DIAG_MESH", "256,128")
              .split(","))


def closest_t(o, d, v0, e1, e2, chunk=4096):
    """Exact Moller-Trumbore closest-hit t (+ winning tri) per ray."""
    nt = v0.shape[0]
    tbest = np.full(o.shape[0], np.inf)
    ibest = np.full(o.shape[0], -1, np.int64)
    for s in range(0, nt, chunk):
        V0, E1, E2 = v0[s:s + chunk], e1[s:s + chunk], e2[s:s + chunk]
        pv = np.cross(d[:, None], E2[None])          # (R, C, 3)
        det = np.einsum("cj,rcj->rc", E1, pv)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = o[:, None] - V0[None]
        u = np.einsum("rcj,rcj->rc", tv, pv) * inv
        qv = np.cross(tv, E1[None])
        v = np.einsum("rj,rcj->rc", d, qv) * inv
        t = np.einsum("cj,rcj->rc", E2, qv) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-2)
        t = np.where(hit, t, np.inf)
        j = t.argmin(axis=1)
        tc = t[np.arange(len(o)), j]
        upd = tc < tbest
        tbest = np.where(upd, tc, tbest)
        ibest = np.where(upd, s + j, ibest)
    return tbest, ibest


def main():
    scn = big_scene(*_MESH)
    tblT, aabbs, aabbs_m = M._tri_blocks(scn)
    nb = aabbs.shape[0]
    v0 = tblT[0:3].T.astype(np.float64)
    e1 = tblT[3:6].T.astype(np.float64)
    e2 = tblT[6:9].T.astype(np.float64)
    print(f"mesh {_MESH}: {nb} blocks ({int((aabbs[:,0]<=aabbs[:,3]).sum())}"
          f" live), {v0.shape[0]} packed rows", flush=True)

    o, d = primary_rays(SIZE)
    TW, TH = M._TW, M._TH
    tiles_x = SIZE // TW
    jj, ii = np.mgrid[0:SIZE, 0:SIZE]
    keep = ((ii % SUB == 0) & (jj % SUB == 0)).ravel()
    tile_id = ((jj // TH) * tiles_x + (ii // TW)).ravel()[keep]
    o, d = o[keep], d[keep]
    n_tiles = tiles_x * (SIZE // TH)

    # pre-triangle state t: floor + unit spheres (squares are tiny)
    t_pre = np.where(d[:, 2] < 0, -o[:, 2] / d[:, 2], 1e9)
    for c in np.asarray(scn.sphere_centers, np.float64):
        p = o - c
        b = np.einsum("rj,rj->r", p, d)
        q = b * b - (np.einsum("rj,rj->r", p, p) - 1.0)
        s = -b - np.sqrt(np.maximum(q, 0.0))
        t_pre = np.where((q > 0) & (s > 1e-2) & (s < t_pre), s, t_pre)

    t_hit, i_hit = closest_t(o, d, v0, e1, e2)
    print(f"rays {len(o)}: {int(np.isfinite(t_hit).sum())} hit the mesh",
          flush=True)
    win_blk = np.where(i_hit >= 0, i_hit // M._TRI_BLOCK, nb)

    # slab per (ray, block) + entry t
    inv = 1.0 / d
    lo, hi = aabbs[:, :3].astype(np.float64), aabbs[:, 3:].astype(np.float64)
    t0 = (lo[None] - o[:, None]) * inv[:, None]
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    tmin = np.minimum(t0, t1).max(axis=2)
    tmax = np.maximum(t0, t1).min(axis=2)
    slab = (tmax >= tmin) & (tmax >= 1e-2)
    tmin = np.maximum(tmin, 0.0)

    t_final = np.minimum(t_pre, t_hit)

    def count(S):
        seg_len = -(-nb // S)
        total = 0
        for s in range(S):
            b0, b1 = s * seg_len, min((s + 1) * seg_len, nb)
            # t known to each ray BEFORE this segment runs
            t_cur = np.where(win_blk < b0, t_final, t_pre)
            take = slab[:, b0:b1] & (tmin[:, b0:b1] <= t_cur[:, None] * 1.001)
            per_tile = np.zeros((n_tiles, b1 - b0), bool)
            np.logical_or.at(per_tile, tile_id, take)
            total += int(per_tile.sum())
        return total

    base = count(1)
    print(f"taken block-scans/frame (sum over {n_tiles} tiles):", flush=True)
    print(f"  S=1 (shipped) : {base}")
    for S in (2, 4, 8, 16):
        c = count(S)
        print(f"  S={S:<2}          : {c}  ({c / base:.2f}x)")
    ideal = slab & (tmin <= t_final[:, None] * 1.001)
    per_tile = np.zeros((n_tiles, nb), bool)
    np.logical_or.at(per_tile, tile_id, ideal)
    print(f"  perfect prune : {int(per_tile.sum())}  "
          f"({per_tile.sum() / base:.2f}x)")


if __name__ == "__main__":
    main()
