"""The Pallas grid-DDA experiment (r3 VERDICT #8; shadow arm + 65k/262k
sizes + a Morton take-list twin added in round 5 per r4 VERDICT #3).

The reference-shaped per-ray DDA (ops/grid.py::traverse_triangles,
faithful to trianglegrid pathtracer.ocl:157-198) measured 0.2 Mpaths/s
on TPU as a full render - per-lane gathers (`grid.items[cell]`,
`table[rows]`) each step are the anti-pattern the megakernel's
constant-order scans avoid.  This tool makes the HONEST Pallas attempt
the round-3 review asked for: a per-tile cell-list walk where the grid
is exploited TPU-style -

  * the fixed camera makes per-tile PRIMARY cell lists STATIC: the host
    computes, per 64x32 pixel tile, the occupied grid cells any of the
    tile's rays crosses (slab test == DDA visitation), and the kernel
    walks that list;
  * each listed cell's triangle rows live in an HBM table padded to
    128-lane columns (cell c at column c*128), DMA'd per cell into SMEM
    and broadcast-tested against all 2048 lanes - the same scalar-
    broadcast row scan the megakernel uses, so the comparison isolates
    the TRAVERSAL structure;
  * the SHADOW arm re-runs the same walk as an occlusion pass: origins
    are the closest-hit points, one bundle per scene light, per-tile
    lists built from the actual hit-point-to-light segments (the
    idealized static analogue of the production dynamic occ prepass -
    it gives the cell walk its best shot).

Twins on identical structure (same kernels, different lists/tables):
  cell-list walk     occupied grid cells (this experiment)
  morton take-list   the production blocked tier's 128-triangle Morton
                     blocks + per-tile slab take-lists - the apples-to-
                     apples stand-in for ops/pallas_super.py's scan
  dense scan         every 128-row block (<= 20k only; context)
  XLA per-lane DDA   ops/grid.py::traverse_triangles (<= 20k only)

The structural gap this measures: grid cells at these meshes hold
10-15 live triangles in a 128-lane DMA column (~90% padding, 5-6x
duplication across cells) while Morton blocks are disjoint and full -
docs/PERF.md "Large meshes" records the verdict.

Run on TPU: PYTHONPATH=/root/repo python tools/diag_dda_pallas.py
Env: PT_DIAG_SIZE=512, PT_DIAG_SCENES=demo,5k,20k,65k,262k
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.grid import (
    triangle_grid, traverse_triangles)
from opencl_montecarlo_path_tracing_tpu.ops.intersect import (
    prep_scene, _tri_table)
from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
    demo_scene, torus_mesh)
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
from tools.diag_blocked_host import primary_rays

SIZE = int(os.environ.get("PT_DIAG_SIZE", "512"))
_U = 8          # row-test unroll (matches _TRI_UNROLL)
_BIGF = np.float32(3e38)


def _dda_kernel(llen_ref, ids_ref, cnts_ref, rowsT_any, out_ref,
                scratch, sem, *, width: int):
    """Per-tile closest-hit over a cell list: DMA each listed cell's
    (16, 128) row slice into SMEM, dynamic-trip row scan vs all lanes."""
    tile = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (M._SUB, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (M._SUB, 128), 0)
    tiles_x = -(-width // M._TW)
    tx = tile % np.int32(tiles_x)
    ty = tile // np.int32(tiles_x)
    idx = sub * 128 + lane
    ii = (tx * np.int32(M._TW) + idx % np.int32(M._TW)).astype(jnp.float32)
    jj = (ty * np.int32(M._TH) + idx // np.int32(M._TW)).astype(jnp.float32)
    half = jnp.full(ii.shape, 0.5, jnp.float32)
    ox, oy, oz, dx, dy, dz = M._primary_rays_k(ii, jj, half, half, half,
                                               half)

    bn = jnp.full(ii.shape, _BIGF, jnp.float32)
    bd = jnp.ones(ii.shape, jnp.float32)
    m = jnp.zeros(ii.shape, jnp.int32)
    z = jnp.zeros(ii.shape, jnp.float32)
    needs = jnp.ones(ii.shape, jnp.int32)
    carry = (bn, bd, m, z, z, z, needs)

    def cell_body(k, carry):
        cid = ids_ref[0, 0, k]
        cnt = cnts_ref[0, 0, k]
        cp = pltpu.make_async_copy(
            rowsT_any.at[:, pl.ds(cid * 128, 128)], scratch, sem)
        cp.start()
        cp.wait()

        def rows(j, c):
            for u in range(_U):
                rr = j * _U + u
                r = [scratch[q, rr] for q in range(12)]
                c = M._tri_closest_row(r, ox, oy, oz, dx, dy, dz, False, c)
            return c

        trips = (cnt + np.int32(_U - 1)) // np.int32(_U)
        return jax.lax.fori_loop(0, trips, rows, carry)

    bn, bd, m, nx, ny, nz, needs = jax.lax.fori_loop(
        0, llen_ref[0, 0, 0], cell_body, carry)
    t = jnp.where(m == 4, bn / bd, _BIGF)
    out_ref[0:M._SUB, :] = t
    out_ref[M._SUB:2 * M._SUB, :] = m.astype(jnp.float32)


def _occ_kernel(llen_ref, ids_ref, cnts_ref, rowsT_any, o_ref, d_ref,
                tl_ref, out_ref, scratch, sem):
    """Per-tile OCCLUSION pass over a (shadow) cell list: same DMA + row
    scan, accumulating the any-occluder mask against the per-lane t
    limit (the shadow arm the r4 review asked for)."""
    ox = o_ref[0:M._SUB, :]
    oy = o_ref[M._SUB:2 * M._SUB, :]
    oz = o_ref[2 * M._SUB:3 * M._SUB, :]
    dx = d_ref[0:M._SUB, :]
    dy = d_ref[M._SUB:2 * M._SUB, :]
    dz = d_ref[2 * M._SUB:3 * M._SUB, :]
    tl = tl_ref[...]
    occ = jnp.zeros((M._SUB, 128), jnp.int32)

    def cell_body(k, occ):
        cid = ids_ref[0, 0, k]
        cnt = cnts_ref[0, 0, k]
        cp = pltpu.make_async_copy(
            rowsT_any.at[:, pl.ds(cid * 128, 128)], scratch, sem)
        cp.start()
        cp.wait()

        def rows(j, occ):
            for u in range(_U):
                rr = j * _U + u
                r = [scratch[q, rr] for q in range(12)]
                occ = M._tri_occ_row(r, ox, oy, oz, dx, dy, dz, False,
                                     tl, occ)
            return occ

        trips = (cnt + np.int32(_U - 1)) // np.int32(_U)
        return jax.lax.fori_loop(0, trips, rows, occ)

    occ = jax.lax.fori_loop(0, llen_ref[0, 0, 0], cell_body, occ)
    out_ref[...] = occ.astype(jnp.float32)


def make_pallas_fn(llen, ids, cnts, rowsT, width, height):
    """Build ONE jitted callable (re-tracing a fresh pallas_call per
    repeat dominated the first measurements)."""
    n_tiles = (width // M._TW) * (height // M._TH)
    Lmax = ids.shape[1]
    kernel = functools.partial(_dda_kernel, width=width)
    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Lmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Lmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((2 * M._SUB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 2 * M._SUB, 128),
                                       jnp.float32),
        scratch_shapes=[pltpu.SMEM((16, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        cost_estimate=pl.CostEstimate(
            flops=width * height * 40 * 128,
            bytes_accessed=n_tiles * Lmax * 8192,
            transcendentals=width * height,
        ),
        interpret=bool(int(os.environ.get("PT_DIAG_INTERPRET", "0"))),
    )
    args = (jnp.asarray(llen.reshape(-1, 1, 8)),
            jnp.asarray(ids.reshape(-1, 1, Lmax)),
            jnp.asarray(cnts.reshape(-1, 1, Lmax)), jnp.asarray(rowsT))
    jf = jax.jit(lambda a, b, c, d: fn(a, b, c, d))
    return lambda: jf(*args)


def make_occ_fn(llen, ids, cnts, rowsT, o_t, d_t, tl_t, width, height):
    n_tiles = (width // M._TW) * (height // M._TH)
    Lmax = ids.shape[1]
    fn = pl.pallas_call(
        _occ_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Lmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Lmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * M._SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * M._SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M._SUB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M._SUB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * M._SUB, 128),
                                       jnp.float32),
        scratch_shapes=[pltpu.SMEM((16, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        cost_estimate=pl.CostEstimate(
            flops=width * height * 40 * 128,
            bytes_accessed=n_tiles * Lmax * 8192,
            transcendentals=width * height,
        ),
        interpret=bool(int(os.environ.get("PT_DIAG_INTERPRET", "0"))),
    )
    args = (jnp.asarray(llen.reshape(-1, 1, 8)),
            jnp.asarray(ids.reshape(-1, 1, Lmax)),
            jnp.asarray(cnts.reshape(-1, 1, Lmax)), jnp.asarray(rowsT),
            jnp.asarray(o_t), jnp.asarray(d_t), jnp.asarray(tl_t))
    jf = jax.jit(lambda *a: fn(*a))
    return lambda: jf(*args)


def reassemble(out, width, height, rows_per_tile=2):
    tiles_x = width // M._TW
    tiles_y = height // M._TH
    n_tiles = tiles_x * tiles_y
    o = np.asarray(out).reshape(n_tiles, rows_per_tile, M._SUB, 128)
    t = o[:, 0].reshape(tiles_y, tiles_x, M._TH, M._TW)
    return t.transpose(0, 2, 1, 3).reshape(height, width)


def tile_pack(width, height, arr):
    """(H, W) -> per-tile (n_tiles*_SUB, 128) layout the kernels use."""
    tiles_x = width // M._TW
    tiles_y = height // M._TH
    a = arr.reshape(tiles_y, M._TH, tiles_x, M._TW).transpose(0, 2, 1, 3)
    return a.reshape(tiles_y * tiles_x, M._SUB, 128).reshape(-1, 128)


def build_tables(scn, modifier=3.0):
    """Packed occupied-cell row table (16, nocc*128) + per-cell boxes."""
    grid, (vmin, vmax) = triangle_grid(scn, modifier)
    counts = np.asarray(grid.counts)
    items = np.asarray(grid.items)
    occ = np.flatnonzero(counts > 0)
    tbl = np.asarray(_tri_table(scn), np.float32)
    nocc = len(occ)
    rowsT = np.full((16, nocc * 128), np.nan, np.float32)
    for p, c in enumerate(occ):
        n = int(counts[c])
        rows = items[c, :n]
        rowsT[:12, p * 128:p * 128 + n] = tbl[rows, :12].T
    rx, ry, rz = grid.res
    cz, cyx = np.divmod(occ, rx * ry)
    cy, cx = np.divmod(cyx, rx)
    cs = np.asarray(grid.cell_size, np.float64)
    vmin64 = np.asarray(grid.vmin, np.float64)
    blo = vmin64 + np.stack([cx, cy, cz], 1) * cs
    bhi = blo + cs
    return grid, rowsT, occ, counts[occ].astype(np.int32), blo, bhi


def _lists_from_boxes(o, d, blo, bhi, width, height, tmax_cap=None,
                      sort_near=True):
    """Per-tile box visitation: an interval prefilter per tile (cheap
    scalar slab on per-tile o/d component ranges - a superset) followed
    by the exact any-lane slab on the candidates only.  ``tmax_cap``
    (per-ray, e.g. distance to the light) bounds the segment."""
    tiles_x = width // M._TW
    n_tiles = tiles_x * (height // M._TH)
    jj, ii = np.mgrid[0:height, 0:width]
    tile_id = ((jj // M._TH) * tiles_x + (ii // M._TW)).ravel()
    with np.errstate(divide="ignore"):
        inv = 1.0 / d
    ids, lens = [], []
    for t in range(n_tiles):
        sel = tile_id == t
        os_, ds_ = o[sel], d[sel]
        live = np.isfinite(os_).all(axis=1)
        if not live.any():
            ids.append(np.zeros(0, np.int64))
            lens.append(0)
            continue
        osl, dsl = os_[live], ds_[live]
        # interval prefilter: conservative slab with per-component ranges
        olo, ohi = osl.min(0), osl.max(0)
        dlo, dhi = dsl.min(0), dsl.max(0)
        cap = np.inf if tmax_cap is None else float(
            np.max(tmax_cap[sel][live]))
        cand = _interval_slab(blo, bhi, olo, ohi, dlo, dhi, cap)
        if not cand.any():
            ids.append(np.zeros(0, np.int64))
            lens.append(0)
            continue
        ci = np.flatnonzero(cand)
        invl = inv[sel][live]
        t0 = (blo[ci][None] - osl[:, None]) * invl[:, None]
        t1 = (bhi[ci][None] - osl[:, None]) * invl[:, None]
        tmin = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)
        tmax = np.maximum(t0, t1).min(axis=2)
        hi_ = (tmax_cap[sel][live][:, None] if tmax_cap is not None
               else np.inf)
        hit = (tmax >= tmin) & (tmax >= 1e-2) & (tmin <= hi_)
        take = np.flatnonzero(hit.any(axis=0))
        if sort_near:
            order = np.argsort(np.where(hit[:, take], tmin[:, take],
                                        np.inf).min(axis=0), kind="stable")
            take = take[order]
        ids.append(ci[take])
        lens.append(len(take))
    Lmax = max(1, max(lens))
    ids_a = np.zeros((n_tiles, Lmax), np.int32)
    for t, x in enumerate(ids):
        ids_a[t, :len(x)] = x
    llen = np.zeros((n_tiles, 8), np.int32)
    llen[:, 0] = lens
    return llen, ids_a, lens


def _interval_slab(blo, bhi, olo, ohi, dlo, dhi, cap):
    """Conservative box-vs-ray-family slab: per axis the entry/exit
    interval of ANY ray with o in [olo,ohi], d in [dlo,dhi] (division-
    free form: compare plane offsets against t*d ranges is messy - use
    the 4-corner inv bound instead)."""
    res = np.ones(blo.shape[0], bool)
    tlo = np.zeros(blo.shape[0])
    thi = np.full(blo.shape[0], min(cap, 1e30))
    for a in range(3):
        lo_off = blo[:, a][None] - np.array([olo[a], ohi[a]])[:, None]
        hi_off = bhi[:, a][None] - np.array([olo[a], ohi[a]])[:, None]
        # candidate inverse-direction extremes
        ds = np.array([dlo[a], dhi[a]])
        ds = ds[ds != 0]
        if len(ds) == 0 or (dlo[a] < 0 < dhi[a]):
            # a ray family straddling zero direction can enter anywhere
            # along the axis: only reject when the box misses the o range
            miss = (bhi[:, a] < olo[a] - abs(cap) * max(abs(dlo[a]),
                                                        abs(dhi[a]))) | \
                   (blo[:, a] > ohi[a] + abs(cap) * max(abs(dlo[a]),
                                                        abs(dhi[a])))
            res &= ~miss
            continue
        invs = 1.0 / ds
        cands = np.concatenate([lo_off[None] * invs[:, None, None],
                                hi_off[None] * invs[:, None, None]], 0)
        cands = cands.reshape(-1, blo.shape[0])
        tlo = np.maximum(tlo, cands.min(axis=0).clip(min=0))
        thi = np.minimum(thi, cands.max(axis=0))
    return res & (thi >= tlo) & (thi >= 1e-2)


def tile_lists(o, d, blo, bhi, width, height):
    return _lists_from_boxes(o, d, blo, bhi, width, height)


def bench(fn, repeats=3, tag=""):
    t0 = time.perf_counter()
    out = np.asarray(fn())
    first = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = np.asarray(fn())
        times.append(time.perf_counter() - t0)
    best = min(times)
    paths = SIZE * SIZE
    print(f"  {tag:28s}: {best * 1e3:8.2f} ms ({paths / best / 1e6:7.2f} "
          f"Mpaths/s) [first {first:.1f}s]", flush=True)
    return out, best


def shadow_arm(tag2, llen_fn, rowsT, blo, bhi, t_map, m_map, o, d,
               lights, width, height):
    """Occlusion pass per light from the closest-hit points over the
    given box structure; returns (sum of best times, occ maps)."""
    hitm = (m_map == 4) & (t_map < 1e30)
    x = o + d * t_map.ravel()[:, None]
    x[~hitm.ravel()] = np.nan
    total = 0.0
    occs = []
    for li, (lx, ly, lz, inten) in enumerate(lights):
        lp = np.array([lx + 0.5, ly + 0.5, lz], np.float64)  # 0.5 jitter
        seg = lp[None] - x
        dist = np.linalg.norm(seg, axis=1)
        with np.errstate(invalid="ignore"):
            sd = seg / dist[:, None]
        llen, ids_a, lens = _lists_from_boxes(
            x, sd, blo, bhi, width, height, tmax_cap=dist, sort_near=False)
        cnts_a = llen_fn(ids_a)
        xs = np.nan_to_num(x, nan=1e9)
        sds = np.nan_to_num(sd, nan=1.0)
        # per-tile [x rows; y rows; z rows] layout the occ kernel slices
        o_t = np.concatenate([np.stack([
            tile_pack(width, height, xs[:, c].reshape(height, width))
            .reshape(-1, M._SUB, 128) for c in range(3)], axis=1)
            .reshape(-1, 128)], axis=0)
        d_t = np.concatenate([np.stack([
            tile_pack(width, height, sds[:, c].reshape(height, width))
            .reshape(-1, M._SUB, 128) for c in range(3)], axis=1)
            .reshape(-1, 128)], axis=0)
        tl_t = tile_pack(width, height,
                         np.nan_to_num(dist, nan=-1.0).reshape(height,
                                                               width))
        out, tbest = bench(
            make_occ_fn(llen, ids_a, cnts_a, rowsT.astype(np.float32),
                        o_t.astype(np.float32), d_t.astype(np.float32),
                        tl_t.astype(np.float32), width, height),
            tag=f"{tag2} shadow L{li} (lists mean {np.mean(lens):.0f})")
        total += tbest
        occs.append(reassemble(out, width, height, rows_per_tile=1))
    return total, occs


def main():
    scenes = os.environ.get("PT_DIAG_SCENES", "demo,5k").split(",")
    for tag in scenes:
        base, _ = demo_scene()
        if tag == "demo":
            scn = prep_scene(base)
        else:
            # ripple sheets: dense tori fall under the reference det
            # cutoff (invisible - every test here would be vacuous)
            from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
                ripple_sheet_mesh)
            nm = {"5k": (50, 50), "20k": (144, 72), "65k": (256, 128),
                  "262k": (512, 256)}[tag]
            scn = prep_scene(Scene(
                sphere_centers=base.sphere_centers,
                square_kj=base.square_kj,
                triangles=ripple_sheet_mesh(nm[0], nm[1]),
                lights=base.lights))
        nt = int(scn.tri_v0.shape[0])
        small = nt <= 25000
        grid, rowsT, occ, cnts, blo, bhi = build_tables(scn)
        o, d = primary_rays(SIZE)
        t0 = time.time()
        llen, ids_a, lens = tile_lists(o, d, blo, bhi, SIZE, SIZE)
        cnts_a = np.broadcast_to(cnts[ids_a],
                                 ids_a.shape).astype(np.int32).copy()
        print(f"{tag}: nt={nt} res={grid.res} occupied={len(occ)} "
              f"cell lists mean {np.mean(lens):.0f} max {max(lens)} "
              f"(host build {time.time()-t0:.0f}s; sum tris/tile mean "
              f"{np.mean([cnts[ids_a[t, :lens[t]]].sum() for t in range(len(lens))]):.0f})",
              flush=True)

        out_l, t_list = bench(
            make_pallas_fn(llen, ids_a, cnts_a, rowsT, SIZE, SIZE),
            tag="cell-list closest")
        t_l = reassemble(out_l, SIZE, SIZE)
        m_l = reassemble(np.asarray(out_l).reshape(-1, 2 * M._SUB, 128)
                         [:, M._SUB:].reshape(-1, 128), SIZE, SIZE,
                         rows_per_tile=1)

        # Morton take-list twin: the production blocked tier's structure
        # (disjoint, full 128-triangle Morton blocks + per-tile slab
        # take-lists) in the SAME kernel - the apples-to-apples baseline
        tblT, baabbs, _macro = M._tri_blocks(scn)
        nb = baabbs.shape[0]
        real = np.isfinite(baabbs).all(axis=1)
        mb_lo = np.where(real[:, None], baabbs[:, :3], 1e30)
        mb_hi = np.where(real[:, None], baabbs[:, 3:], -1e30)
        t0 = time.time()
        llen_m, ids_m, lens_m = tile_lists(o, d, mb_lo, mb_hi, SIZE, SIZE)
        cnts_m = np.full(ids_m.shape, 128, np.int32)
        print(f"  morton blocks={nb} lists mean {np.mean(lens_m):.0f} "
              f"max {max(lens_m)} (host build {time.time()-t0:.0f}s)",
              flush=True)
        out_m, t_mort = bench(
            make_pallas_fn(llen_m, ids_m, cnts_m, tblT[:16], SIZE, SIZE),
            tag="morton take-list closest")
        t_m = reassemble(out_m, SIZE, SIZE)
        m_m = reassemble(np.asarray(out_m).reshape(-1, 2 * M._SUB, 128)
                         [:, M._SUB:].reshape(-1, 128), SIZE, SIZE,
                         rows_per_tile=1)

        hit = t_m < 1e30
        assert hit.any()
        dl = np.abs(t_l - t_m)[hit] / np.maximum(t_m[hit], 1.0)
        print(f"  cell vs morton closest: hits {int(hit.sum())}, max rel "
              f"{dl.max():.2e}; miss masks equal: "
              f"{bool(((t_l < 1e30) == hit).all())}", flush=True)

        # shadow arms over the same hit set (from the morton t/m maps -
        # identical to the cell maps up to the asserted tolerance)
        lights = np.asarray(scn.lights, np.float64)
        ts_cell, occ_c = shadow_arm(
            "cell", lambda ids: np.broadcast_to(
                cnts[ids], ids.shape).astype(np.int32).copy(),
            rowsT, blo, bhi, t_m, m_m, o, d, lights, SIZE, SIZE)
        ts_mort, occ_m = shadow_arm(
            "morton", lambda ids: np.full(ids.shape, 128, np.int32),
            tblT[:16], mb_lo, mb_hi, t_m, m_m, o, d, lights, SIZE, SIZE)
        for li in range(len(lights)):
            eq = (occ_c[li] != 0) == (occ_m[li] != 0)
            print(f"  occ L{li} equal: {bool(eq.all())} "
                  f"(mismatch {int((~eq).sum())})", flush=True)

        tot_cell = t_list + ts_cell
        tot_mort = t_mort + ts_mort
        print(f"  TOTALS closest+shadow: cell {tot_cell*1e3:.2f} ms, "
              f"morton {tot_mort*1e3:.2f} ms -> cell/morton "
              f"{tot_mort / tot_cell:.2f}x "
              f"({'cell wins' if tot_cell < tot_mort else 'morton wins'})",
              flush=True)

        if small:
            # dense twin + XLA DDA only at sizes where they are tractable
            nb_d = -(-nt // 128)
            rowsT_d = np.full((16, nb_d * 128), np.nan, np.float32)
            tbl = np.asarray(_tri_table(scn), np.float32)
            rowsT_d[:12, :nt] = tbl[:, :12].T
            n_tiles = (SIZE // M._TW) * (SIZE // M._TH)
            ids_d = np.broadcast_to(np.arange(nb_d, dtype=np.int32),
                                    (n_tiles, nb_d)).copy()
            cnts_d = np.broadcast_to(
                np.minimum(128, nt - np.arange(nb_d) * 128).astype(np.int32),
                (n_tiles, nb_d)).copy()
            llen_d = np.zeros((n_tiles, 8), np.int32)
            llen_d[:, 0] = nb_d
            out_d, t_dense = bench(
                make_pallas_fn(llen_d, ids_d, cnts_d, rowsT_d, SIZE, SIZE),
                tag="pallas dense scan")
            t_d = reassemble(out_d, SIZE, SIZE)
            dl = np.abs(t_l - t_d)[hit] / np.maximum(t_d[hit], 1.0)
            print(f"  cell-list vs dense: max rel {dl.max():.2e}; "
                  f"speedup cell/dense {t_dense / t_list:.2f}x", flush=True)

            of = jnp.asarray(o, jnp.float32)
            df = jnp.asarray(d, jnp.float32)
            R = of.shape[0]
            big = jnp.full((R,), _BIGF, jnp.float32)
            zero = jnp.zeros((R,), jnp.float32)
            dda = jax.jit(lambda o3, d3: traverse_triangles(
                o3, d3, big, jnp.zeros((R,), jnp.int32), zero, zero, zero,
                jnp.ones((R,), bool), scn, grid)[0])
            out_x, t_xla = bench(lambda: dda(of, df), tag="XLA per-lane DDA")
            t_x = np.asarray(out_x).reshape(SIZE, SIZE)
            hx = t_x < 1e30
            both = hit & hx
            dx_ = np.abs(t_x - t_m)[both] / np.maximum(t_m[both], 1.0)
            print(f"  XLA DDA vs morton: both-hit {int(both.sum())} "
                  f"(mask mismatches {int((hx != hit).sum())}), max rel "
                  f"{dx_.max():.2e}; cell/XLA-DDA {t_xla / t_list:.1f}x",
                  flush=True)


if __name__ == "__main__":
    main()
