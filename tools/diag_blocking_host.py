"""Host sim: Morton-chunk vs median-split BLOCK PARTITIONING.

The blocked/stream scan cost is set by how many 128-triangle blocks each
tile bundle's any-lane union takes; the per-block AABB tightness is set
entirely by the host-side partition (ops/pallas_super.py::_tri_blocks
Morton-sorts centroids then chunks).  A BVH-style recursive median split
(longest centroid axis, split at a 128-aligned median) produces blocks
with tighter, less elongated boxes for the same block count - this tool
quantifies the frame-level win BEFORE touching the kernel:

  per-tile any-lane slab unions at 512^2, primaries (with the floor
  t-prune the kernel applies) AND shadow bundles from brute-force
  primary hits toward each light (anchored to the global box like
  _anchor_stacked), Morton vs median-split, at several mesh sizes.

Run: PYTHONPATH=/root/repo python tools/diag_blocking_host.py
     (PT_DIAG_MESH="256,128" etc. to pick the torus density)
"""

from __future__ import annotations

import os

import numpy as np

from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from tools.diag_blocked import big_scene
from tools.diag_blocked_host import primary_rays

SIZE = 512
MESHES = [tuple(int(x) for x in m.split(","))
          for m in os.environ.get(
              "PT_DIAG_MESH", "160,128/256,128/512,256").split("/")]


def median_split_order(lo, hi, block=None):
    """Recursive longest-axis median split of triangle AABBs into
    128-aligned contiguous runs; returns the permutation."""
    block = block or M._TRI_BLOCK
    c = 0.5 * (lo + hi)
    out = []

    def rec(idx):
        if len(idx) <= block:
            out.append(idx)
            return
        cc = c[idx]
        ax = int(np.argmax(cc.max(axis=0) - cc.min(axis=0)))
        order = np.argsort(cc[:, ax], kind="stable")
        # split point: half the BLOCKS, so left child stays 128-aligned
        nb = -(-len(idx) // block)
        cut = (nb // 2) * block
        rec(idx[order[:cut]])
        rec(idx[order[cut:]])

    rec(np.arange(len(c)))
    return np.concatenate(out)


def build_aabbs(lo, hi, order):
    nt = len(order)
    lo, hi = lo[order], hi[order]
    n_blocks = -(-nt // M._TRI_BLOCK)
    n_blocks = -(-n_blocks // M._MACRO) * M._MACRO
    aabbs = np.full((n_blocks, 6), np.nan, np.float32)
    for b in range(n_blocks):
        s, e = b * M._TRI_BLOCK, min((b + 1) * M._TRI_BLOCK, nt)
        if s >= nt:
            continue
        blo, bhi = lo[s:e].min(axis=0), hi[s:e].max(axis=0)
        pad = 1e-3 * (bhi - blo) + 1e-4
        aabbs[b, :3], aabbs[b, 3:] = blo - pad, bhi + pad
    return aabbs


def union_counts(o, d, t_hi, gate, aabbs, tile_id, n_tiles):
    """Per-tile any-lane slab union block count (kernel semantics:
    tmax >= max(tmin, 0), entry before the ray's t bound)."""
    ok = ~np.isnan(aabbs[:, 0])
    lo = aabbs[ok, :3].astype(np.float64)
    hi = aabbs[ok, 3:].astype(np.float64)
    inv = 1.0 / d
    total = 0
    for t in range(n_tiles):
        sel = (tile_id == t) & gate
        if not sel.any():
            continue
        t0 = (lo[None] - o[sel, None]) * inv[sel, None]
        t1 = (hi[None] - o[sel, None]) * inv[sel, None]
        tmin = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)
        tmax = np.maximum(t0, t1).min(axis=2)
        lane = ((tmax >= tmin) & (tmax >= 1e-2)
                & (tmin <= t_hi[sel, None] * 1.001))
        total += int(lane.any(axis=0).sum())
    return total


def brute_hits(o, d, scn):
    """Closest triangle hit t per ray (numpy Moller-Trumbore), plus the
    floor as the pre-state t (matches the kernel's pre-trace prune)."""
    from opencl_montecarlo_path_tracing_tpu.ops.intersect import _tri_table
    tbl = np.asarray(_tri_table(scn), np.float32)
    t_best = np.where(d[:, 2] < 0, -o[:, 2] / d[:, 2], 1e9)
    hit_tri = np.full(len(o), -1)
    RCH, CH = 4096, 4096          # bound the (R, C, 3) temporaries
    for rs in range(0, len(o), RCH):
        ro, rd = o[rs:rs + RCH], d[rs:rs + RCH]
        rn = len(ro)
        tb = t_best[rs:rs + RCH].copy()
        ht = hit_tri[rs:rs + RCH].copy()
        for s in range(0, tbl.shape[0], CH):
            v0 = tbl[s:s + CH, 0:3]
            e1 = tbl[s:s + CH, 3:6]
            e2 = tbl[s:s + CH, 6:9]
            pv = np.cross(rd[:, None], e2[None])     # (R, C, 3)
            det = (e1[None] * pv).sum(-1)
            bad = np.abs(det) < 1e-12
            inv_det = 1.0 / np.where(bad, 1.0, det)
            tv = ro[:, None] - v0[None]
            u = (tv * pv).sum(-1) * inv_det
            qv = np.cross(tv, e1[None])
            v = (qv * rd[:, None]).sum(-1) * inv_det
            tt = (e2[None] * qv).sum(-1) * inv_det
            good = (~bad & (u >= 0) & (v >= 0) & (u + v <= 1)
                    & (tt > 1e-2) & (tt < tb[:, None]))
            if good.any():
                tt = np.where(good, tt, np.inf)
                j = tt.argmin(axis=1)
                better = tt[np.arange(rn), j] < tb
                tb = np.where(better, tt[np.arange(rn), j], tb)
                ht = np.where(better, s + j, ht)
        t_best[rs:rs + RCH] = tb
        hit_tri[rs:rs + RCH] = ht
    return t_best, hit_tri


def main():
    for mesh in MESHES:
        scn = big_scene(*mesh)
        from opencl_montecarlo_path_tracing_tpu.ops.intersect import (
            _tri_table)
        tbl = np.asarray(_tri_table(scn))
        nt = tbl.shape[0]
        v0 = tbl[:, 0:3]
        v1, v2 = v0 + tbl[:, 3:6], v0 + tbl[:, 6:9]
        lo = np.minimum(np.minimum(v0, v1), v2)
        hi = np.maximum(np.maximum(v0, v1), v2)

        # Morton order (the shipped build)
        c = 0.5 * (lo + hi)
        smin = c.min(axis=0)
        ext = np.maximum(c.max(axis=0) - smin, 1e-30)
        q = np.clip((c - smin) / ext * 1023.0, 0, 1023.0).astype(np.uint64)
        code = (M._part1by2(q[:, 0]) | (M._part1by2(q[:, 1]) << np.uint64(1))
                | (M._part1by2(q[:, 2]) << np.uint64(2)))
        omor = np.argsort(code, kind="stable")
        omed = median_split_order(lo, hi)

        a_mor = build_aabbs(lo, hi, omor)
        a_med = build_aabbs(lo, hi, omed)

        o, d = primary_rays(SIZE)
        TW, TH = M._TW, M._TH
        tiles_x = SIZE // TW
        jj, ii = np.mgrid[0:SIZE, 0:SIZE]
        tile_id = ((jj // TH) * tiles_x + (ii // TW)).ravel()
        n_tiles = tiles_x * (SIZE // TH)
        t_pre = np.where(d[:, 2] < 0, -o[:, 2] / d[:, 2], 1e9)
        allg = np.ones(len(o), bool)

        p_mor = union_counts(o, d, t_pre, allg, a_mor, tile_id, n_tiles)
        p_med = union_counts(o, d, t_pre, allg, a_med, tile_id, n_tiles)

        # shadow bundles: hit points toward each light, anchored to the
        # global box (kernel: _anchor_stacked), only lanes that hit
        # something (floor or mesh) and face the light.  Brute-force
        # closest hits are the expensive part - sample every 4th tile
        # (the ratio is what matters for the A/B decision)
        tile_sub = np.isin(tile_id, np.arange(0, n_tiles, 4))
        o, d = o[tile_sub], d[tile_sub]
        tile_id = tile_id[tile_sub]
        t_best, _ = brute_hits(o.astype(np.float32), d.astype(np.float32), scn)
        x = o + t_best[:, None] * d
        gbox_lo = a_mor[~np.isnan(a_mor[:, 0]), :3].min(axis=0)
        gbox_hi = a_mor[~np.isnan(a_mor[:, 0]), 3:].max(axis=0)
        s_mor = s_med = 0
        for L in np.asarray(scn.lights):
            ld = L[:3][None] - x
            lend = np.linalg.norm(ld, axis=1, keepdims=True)
            ld = ld / np.maximum(lend, 1e-12)
            # anchor to box entry (same line set)
            invl = 1.0 / ld
            ta = np.maximum.reduce([(np.where(invl[:, k] > 0, gbox_lo[k],
                                              gbox_hi[k]) - x[:, k])
                                    * invl[:, k] for k in range(3)])
            tb = np.minimum.reduce([(np.where(invl[:, k] > 0, gbox_hi[k],
                                              gbox_lo[k]) - x[:, k])
                                    * invl[:, k] for k in range(3)])
            keep = (tb >= ta) & (tb >= 0) & (t_best < 1e8)
            s0 = np.where(keep, np.maximum(ta, 0.0), 0.0)
            xa = x + s0[:, None] * ld
            big = np.full(len(o), 1e9)
            s_mor += union_counts(xa, ld, big, keep, a_mor, tile_id,
                                  n_tiles)
            s_med += union_counts(xa, ld, big, keep, a_med, tile_id,
                                  n_tiles)

        print(f"torus {mesh} nt={nt} blocks={a_mor.shape[0]}: "
              f"primaries morton {p_mor} vs median-split {p_med} "
              f"({p_mor / max(1, p_med):.2f}x); shadow-union morton "
              f"{s_mor} vs median-split {s_med} "
              f"({s_mor / max(1, s_med):.2f}x)", flush=True)


if __name__ == "__main__":
    main()
