"""The Pallas grid-DDA experiment (r3 VERDICT #8).

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
  * closest-hit only (no floor/spheres/shadows): the grid only ever
    accelerated TraceRay (the variant's own contract).

Three implementations on identical pinhole rays at 512^2:
  pallas cell-list walk  (this experiment)
  pallas dense scan      (same kernel, list = every 128-row block of the
                          file-order table - the megakernel's strategy)
  XLA per-lane DDA       (ops/grid.py::traverse_triangles, jitted)

Equality is asserted lane-by-lane (same math for the two Pallas runs;
the XLA DDA differs in Moller-Trumbore formulation -> 1e-3 rel).

Run on TPU: PYTHONPATH=/root/repo python tools/diag_dda_pallas.py
Env: PT_DIAG_SIZE=512, PT_DIAG_SCENES=demo,5k (5k = 50x50 torus swap)
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


def reassemble(out, width, height):
    tiles_x = width // M._TW
    tiles_y = height // M._TH
    n_tiles = tiles_x * tiles_y
    o = np.asarray(out).reshape(n_tiles, 2, M._SUB, 128)
    t = o[:, 0].reshape(tiles_y, tiles_x, M._TH, M._TW)
    return t.transpose(0, 2, 1, 3).reshape(height, width)


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


def tile_lists(o, d, blo, bhi, width, height):
    """Per-tile occupied-cell visitation (any-lane slab == DDA cell
    crossing), near-to-far by hull entry t."""
    tiles_x = width // M._TW
    n_tiles = tiles_x * (height // M._TH)
    jj, ii = np.mgrid[0:height, 0:width]
    tile_id = ((jj // M._TH) * tiles_x + (ii // M._TW)).ravel()
    inv = 1.0 / d
    ids, cnts_l, lens = [], [], []
    for t in range(n_tiles):
        sel = tile_id == t
        t0 = (blo[None] - o[sel, None]) * inv[sel, None]
        t1 = (bhi[None] - o[sel, None]) * inv[sel, None]
        tmin = np.maximum(np.minimum(t0, t1).max(axis=2), 0.0)
        tmax = np.maximum(t0, t1).min(axis=2)
        hit = (tmax >= tmin) & (tmax >= 1e-2)
        take = np.flatnonzero(hit.any(axis=0))
        order = np.argsort(np.where(hit[:, take], tmin[:, take],
                                    np.inf).min(axis=0), kind="stable")
        ids.append(take[order])
        lens.append(len(take))
    Lmax = max(1, max(lens))
    ids_a = np.zeros((n_tiles, Lmax), np.int32)
    for t, x in enumerate(ids):
        ids_a[t, :len(x)] = x
    llen = np.zeros((n_tiles, 8), np.int32)
    llen[:, 0] = lens
    return llen, ids_a, lens


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
    print(f"  {tag:24s}: {best * 1e3:8.2f} ms ({paths / best / 1e6:7.2f} "
          f"Mpaths/s) [first {first:.1f}s]", flush=True)
    return out, best


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
            nm = {"5k": (50, 50), "20k": (144, 72)}[tag]
            scn = prep_scene(Scene(
                sphere_centers=base.sphere_centers,
                square_kj=base.square_kj,
                triangles=ripple_sheet_mesh(nm[0], nm[1]),
                lights=base.lights))
        nt = int(scn.tri_v0.shape[0])
        grid, rowsT, occ, cnts, blo, bhi = build_tables(scn)
        o, d = primary_rays(SIZE)
        llen, ids_a, lens = tile_lists(o, d, blo, bhi, SIZE, SIZE)
        cnts_a = np.broadcast_to(cnts[ids_a],
                                 ids_a.shape).astype(np.int32).copy()
        print(f"{tag}: nt={nt} res={grid.res} occupied={len(occ)} "
              f"tile lists mean {np.mean(lens):.0f} max {max(lens)} "
              f"(sum tris/tile mean "
              f"{np.mean([cnts[ids_a[t, :lens[t]]].sum() for t in range(len(lens))]):.0f})",
              flush=True)

        out_l, t_list = bench(
            make_pallas_fn(llen, ids_a, cnts_a, rowsT, SIZE, SIZE),
            tag="pallas cell-list walk")
        t_l = reassemble(out_l, SIZE, SIZE)

        # dense twin: every 128-row block of the file-order table
        nb = -(-nt // 128)
        rowsT_d = np.full((16, nb * 128), np.nan, np.float32)
        tbl = np.asarray(_tri_table(scn), np.float32)
        rowsT_d[:12, :nt] = tbl[:, :12].T
        n_tiles = (SIZE // M._TW) * (SIZE // M._TH)
        ids_d = np.broadcast_to(np.arange(nb, dtype=np.int32),
                                (n_tiles, nb)).copy()
        cnts_d = np.broadcast_to(
            np.minimum(128, nt - np.arange(nb) * 128).astype(np.int32),
            (n_tiles, nb)).copy()
        llen_d = np.zeros((n_tiles, 8), np.int32)
        llen_d[:, 0] = nb
        out_d, t_dense = bench(
            make_pallas_fn(llen_d, ids_d, cnts_d, rowsT_d, SIZE, SIZE),
            tag="pallas dense scan")
        t_d = reassemble(out_d, SIZE, SIZE)

        # XLA per-lane DDA (the reference-shaped walk), closest-hit only
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

        hit = t_d < 1e30
        assert hit.any()
        dl = np.abs(t_l - t_d)[hit] / np.maximum(t_d[hit], 1.0)
        print(f"  cell-list vs dense: hits {int(hit.sum())}, max rel "
              f"{dl.max():.2e}; miss masks equal: "
              f"{bool(((t_l < 1e30) == hit).all())}", flush=True)
        hx = t_x < 1e30
        both = hit & hx
        dx_ = np.abs(t_x - t_d)[both] / np.maximum(t_d[both], 1.0)
        print(f"  XLA DDA vs dense: both-hit {int(both.sum())} "
              f"(mask mismatches {int((hx != hit).sum())}), max rel "
              f"{dx_.max():.2e}", flush=True)
        print(f"  speedups: cell-list/dense {t_dense / t_list:.2f}x, "
              f"cell-list/XLA-DDA {t_xla / t_list:.1f}x", flush=True)


if __name__ == "__main__":
    main()
