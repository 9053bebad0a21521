"""Host-side estimate: does SUB-GROUPING the stream-tier interval gate
(per-subgroup hulls instead of one hull per 64x32-pixel tile bundle) cut
the conservative block-scan superset enough to matter?

The stream tier's take flags ARE the sign-split interval-gate bits
(ops/pallas_super.py::_interval_union_flags): one hull per bundle spans
the whole 2048-ray tile, so the gate takes every block the HULL frustum
crosses.  Splitting the bundle into S groups of consecutive sublanes
(each = a coherent 64 x 32/S pixel sub-tile; kernel layout
ii = idx % 64, jj = idx // 64, idx = sublane*128 + lane) shrinks each
hull's angular extent ~S-fold at S-fold more (cheap, vector-only)
interval tests.  This tool runs the EXACT any-lane union, the shipped
sign-split gate (S=1), and S in {2, 4, 8} on primary rays of the
PT_DIAG_MESH torus at 512^2 and prints taken block scans per frame.

Usage: PT_DIAG_MESH=512,256 python tools/diag_subgroup_host.py
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


def interval_hit(O, D, th, lo, hi):
    """Full interval slab test (one hull over rays O, D): (nb,) bool.
    Mirrors _interval_test: reciprocal intervals only on sign-pure axes,
    forward-t and running-t (th) prunes."""
    nb = lo.shape[0]
    olo, ohi = O.min(axis=0), O.max(axis=0)
    dlo, dhi = D.min(axis=0), D.max(axis=0)
    ent = np.full(nb, -1e30)
    exi = np.full(nb, 1e30)
    for c in range(3):
        if dlo[c] * dhi[c] <= 0:
            continue            # sign-mixed axis: no constraint
        ilo, ihi = sorted((1.0 / dlo[c], 1.0 / dhi[c]))
        A = np.stack([lo[:, c] - ohi[c], lo[:, c] - olo[c]])
        B = np.stack([hi[:, c] - ohi[c], hi[:, c] - olo[c]])
        pa = np.stack([A * ilo, A * ihi])
        pb = np.stack([B * ilo, B * ihi])
        t0lo, t0hi = pa.min(axis=(0, 1)), pa.max(axis=(0, 1))
        t1lo, t1hi = pb.min(axis=(0, 1)), pb.max(axis=(0, 1))
        ent = np.maximum(ent, np.minimum(t0lo, t1lo))
        exi = np.minimum(exi, np.maximum(t0hi, t1hi))
    ent2 = np.maximum(ent, 0.0)
    return (exi >= ent) & (exi >= 1e-2) & (ent2 <= th * 1.001)


def signsplit_hit(O, D, t_pre, lo, hi):
    """The shipped stream gate on one lane set: AND over axes of OR over
    d-sign halves, each half a full interval test over its lanes."""
    nb = lo.shape[0]
    hit = np.ones(nb, bool)
    for a in range(3):
        ha = np.zeros(nb, bool)
        for half in (D[:, a] > 0, ~(D[:, a] > 0)):
            if not half.any():
                continue
            th = float(np.minimum(t_pre[half], 1e9).max())
            ha |= interval_hit(O[half], D[half], th, lo, hi)
        hit &= ha
    return hit


def main():
    scn = big_scene(*_MESH)
    tblT, aabbs, aabbs_m = M._tri_blocks(scn)
    nb = aabbs.shape[0]
    o, d = primary_rays(SIZE)
    TW, TH = M._TW, M._TH
    tiles_x = SIZE // TW
    n_tiles = tiles_x * (SIZE // TH)
    jj, ii = np.mgrid[0:SIZE, 0:SIZE]
    tile_id = ((jj // TH) * tiles_x + (ii // TW)).ravel()
    # in-tile ray index (the kernel's idx): jj_local * TW + ii_local
    idx_in_tile = ((jj % TH) * TW + (ii % TW)).ravel()

    t_pre = np.where(d[:, 2] < 0, -o[:, 2] / d[:, 2], 1e9)
    lo = aabbs[:, :3].astype(np.float64)
    hi = aabbs[:, 3:].astype(np.float64)
    inv = 1.0 / d

    counts = {"anylane": 0, 1: 0, 2: 0, 4: 0, 8: 0}
    misses = 0
    for t in range(n_tiles):
        sel = tile_id == t
        O, D, TP = o[sel], d[sel], t_pre[sel]
        order = np.argsort(idx_in_tile[sel], kind="stable")
        O, D, TP = O[order], D[order], TP[order]

        # exact per-lane union
        t0 = (lo[None] - O[:, None]) * inv[sel][order][:, None]
        t1 = (hi[None] - O[:, None]) * inv[sel][order][:, None]
        tmin = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)
        tmax = np.maximum(t0, t1).min(axis=2)
        lane = ((tmax >= tmin) & (tmax >= 1e-2)
                & (tmin <= TP[:, None] * 1.001))
        exact = lane.any(axis=0)
        counts["anylane"] += int(exact.sum())

        for S in (1, 2, 4, 8):
            g = np.zeros(nb, bool)
            n = O.shape[0]
            per = n // S
            for s in range(S):
                sl = slice(s * per, (s + 1) * per)
                g |= signsplit_hit(O[sl], D[sl], TP[sl], lo, hi)
            counts[S] += int(g.sum())
            if S == 1:
                misses += int((exact & ~g).sum())

    print(f"mesh {_MESH}: {nb} blocks, {n_tiles} tiles, primaries @ {SIZE}^2")
    a = counts["anylane"]
    print(f"exact any-lane union: {a} block scans/frame")
    for S in (1, 2, 4, 8):
        c = counts[S]
        print(f"sign-split gate S={S}: {c} ({c / max(a, 1):.2f}x exact)")
    print(f"S=1 gate misses exact blocks (MUST be 0): {misses}")


if __name__ == "__main__":
    main()
