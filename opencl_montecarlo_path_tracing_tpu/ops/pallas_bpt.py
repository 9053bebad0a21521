"""Pallas TPU megakernel for the VLP render pass (bidirectional/metropolis).

The reference's bidirectional ``pathTracer`` gathers ALL virtual point
lights per shading point with no shadow rays, then subtracts a soft-shadow
correction per occluded real light (bidirectionalpathtracer.ocl:166-202);
the Metropolis render pass is the same kernel over its own VLP set
(metropolispathtracer.ocl:285-378).  Round 1 ran this as an XLA pipeline
(26.9 Mpaths/s) and round 2's MXU gather kernel reached 32.9 - capped at
~1.4x because a K=16 fp32 contraction pads to the 128-deep systolic array
(docs/PERF.md).

This kernel instead fuses the WHOLE sample step on the VPU, the same
recipe as ops/pallas_super.py: threefry draws, thin-lens camera, the full
primitive scan, the dense VLP gather with the VLP table streamed from SMEM
as broadcast scalars, per-light occlusion traces capped at the light
distance, shading and film accumulation - the film tile lives in VMEM
across the whole spp loop.  A broadcast scalar feeds all 1024 lanes per
cycle where a vector gather feeds ~1, which is why dense-vs-SMEM beats
every gather formulation on TPU (docs/PERF.md "Large meshes").

Semantics match models/bidirectional.py::illum_vlp composed into
models/super.py::sample_super (gather -> clamp 1 -> subtract occluded
corrections -> /4); equality vs the XLA pipeline is pinned by
tests/test_megakernel.py::test_vlp_megakernel_*.

The _vlpgrid variant (metropolispathtracer.ocl vlpgrid:326-349) limits
the gather to the VLPs binned in the shading point's cell.  The
reference (and the XLA path, ops/vlp.py::gather_vlps_grid) makes that a
per-cell LIST walk - per-lane gathers, the TPU anti-pattern.  Here the
grid mode keeps the dense broadcast scan and adds a 6-compare cell-range
mask per (ray, VLP) pair: each VLP row carries its clipped cell-index
AABB (the exact binning of ops/grid.py::build_grid_cellscan), and a pair
contributes iff the lane's cell falls inside it.  Same membership, no
gathers.  (The cell-list cap, MAX_NELS_PER_CELL=62, is a fixed-buffer
artefact of the reference's atomics build; the masked scan is uncapped.
In practice overflowing cells hold only zero-intensity VLPs - the corner
cell where dead VLPs' far-AABBs clip to - so the images agree exactly;
tests pin equality on non-overflowing grids.)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.quirks import Quirks
from ..models import common as C
from .pallas_super import (_BIG, _SUB, _TILE, _TRI_UNROLL, _U32, _threefry,
                           _unit, _normalize3, _trace_rays_shared,
                           _occluded_rays_shared, _primary_rays_k,
                           _shade_rgb, _scene_const)

_VLP_UNROLL = 8            # VLP rows per fori step
_VLP_SPP_GROUP = 1         # spp samples sharing each table pass (see
                           # pallas_super._SPP_GROUP).  Interleaved
                           # on-chip A/B at 512^2x256 post-stacking
                           # (tools/diag_sppgroup_other.py): G=1 220.8,
                           # G=2 216.8, G=4 187.2 Mpaths/s - the
                           # stacked tall gather already fills the VPU;
                           # grouping only adds vreg pressure
_EPS12 = np.float32(1e-12)

# SMEM is ~32KB total on v5e (measured: a 30KB table compiles, 40KB does
# not); leave slack for the scalar block and compiler reservations.  Above
# the direct-fit budget the VLP table streams from HBM in DMA chunks.
_SMEM_BUDGET = 26 * 1024
_VLP_CHUNK = 512           # VLPs per DMA chunk (lane-tiling: multiple of 128)
_VLP_CHUNK_GRID = 256      # grid mode: 11 live rows -> 16-row tile, same 16KB


def _gather_pt(x, y, z, nx, ny, nz):
    """Per-shading-point gather state: (x, y, z, nx, ny, nz, n.x, |x|^2)."""
    return (x, y, z, nx, ny, nz, nx * x + ny * y + nz * z,
            x * x + y * y + z * z)


def _gather_rows_multi(read, n_rows, pts, accs, cells):
    """Accumulate max(lamb, 0) * min(I/d^2, 1) over ``n_rows`` VLPs
    (ocl:166-187; may be a traced scalar - the live count) for SEVERAL
    shading points at once - each row's SMEM scalars are read once and
    applied to every point (spp-group sharing, as in pallas_super).
    ``read(row) -> (px, py, pz, I, |p|^2[, clo3, chi3])``.  Same expanded
    distance + 1e-12 clamp as the XLA scan (ops/vlp.py::gather_vlps), so
    the paths agree to float rounding.

    ``cells[k]`` (grid mode) is (cxf, cyf, czf, in_box): the row's extra
    6 scalars are its clipped cell-index AABB and the pair contributes
    only when the point's cell falls inside it (metropolispathtracer.ocl
    vlpgrid:326-349 membership)."""
    B = len(pts)
    sub = pts[0][0].shape[0]
    # stacked shading points (pallas_super.py::_closest_blocked_multi):
    # each row's gather runs as ONE tall (B*sub, 128) op instead of one
    # per point - identical per-lane math, B x fewer traced eqns
    # (docs/PERF.md "Tracing cost")
    x, y, z, nx, ny, nz, ndx, x2 = (
        jnp.concatenate([p[c] for p in pts], axis=0) for c in range(8))
    if cells[0] is None:
        assert all(c is None for c in cells)
        scell = None
    else:
        scell = tuple(jnp.concatenate([c[i] for c in cells], axis=0)
                      for i in range(4))
    acc = jnp.concatenate(accs, axis=0)

    def body(i, acc):
        for u in range(_VLP_UNROLL):
            r = read(i * _VLP_UNROLL + u)
            p0, p1, p2, vi, p2s = r[0], r[1], r[2], r[3], r[4]
            lamb_num = (nx * p0 + ny * p1 + nz * p2) - ndx
            dist2 = jnp.maximum(
                p2s - np.float32(2.0) * (x * p0 + y * p1 + z * p2) + x2,
                _EPS12)
            rs = jax.lax.rsqrt(dist2)
            # relu(lamb_num) * rs == max(lamb, 0); padded/dead rows
            # drop out through min(I * rs^2, 1) == 0 (I >= 0 by
            # construction, ops/vlp.py::vlp_from_light_sample)
            contrib = (jnp.maximum(lamb_num, np.float32(0.0)) * rs
                       * jnp.minimum(vi * (rs * rs), np.float32(1.0)))
            if scell is not None:
                cxf, cyf, czf, in_box = scell
                member = (in_box
                          & (r[5] <= cxf) & (cxf <= r[8])
                          & (r[6] <= cyf) & (cyf <= r[9])
                          & (r[7] <= czf) & (czf <= r[10]))
                contrib = jnp.where(member, contrib, np.float32(0.0))
            acc = acc + contrib
        return acc

    acc = jax.lax.fori_loop(0, -(-n_rows // _VLP_UNROLL), body, acc)
    return [acc[k * sub:(k + 1) * sub] for k in range(B)]


def _gather_vlps_multi(vlp_ref, pts, n_live, cells):
    """VLP gather, direct mode: the whole (nvp, 5|11) table
    (px, py, pz, I, |p|^2[, cell-range]) resides in SMEM; only the first
    ``n_live`` compacted rows are scanned (runtime bound)."""
    ncols = 5 if cells[0] is None else 11
    read = lambda r: tuple(vlp_ref[r, j] for j in range(ncols))  # noqa: E731
    zeros = [jnp.zeros(p[0].shape, jnp.float32) for p in pts]
    return _gather_rows_multi(read, n_live, pts, zeros, cells)


def _gather_vlps_chunked_multi(vlp_hbm, scratch, sem, pts, n_live, cells):
    """VLP gather, streaming mode for tables beyond the SMEM budget: the
    (8|16, nvp) transposed table lives in HBM and is DMA'd into an SMEM
    scratch chunk by chunk (the transpose keeps every chunk's lane slice
    128-aligned, the Mosaic memref-slice requirement).  One chunk's
    compute dwarfs its 16KB DMA, so no double buffering is needed.  Only
    ceil(n_live / chunk) chunks run, and each chunk's row scan is bounded
    by its live rows (at ~1% liveness a full-chunk scan would cost as
    much as the whole primitive trace; rows beyond n_live are dead and
    contribute exactly +0.0)."""
    from jax.experimental.pallas import tpu as pltpu
    ncols = 5 if cells[0] is None else 11
    chunk = _VLP_CHUNK if cells[0] is None else _VLP_CHUNK_GRID
    read = lambda r: tuple(scratch[j, r] for j in range(ncols))  # noqa: E731

    def chunk_body(c, accs):
        cp = pltpu.make_async_copy(
            vlp_hbm.at[:, pl.ds(c * chunk, chunk)], scratch, sem)
        cp.start()
        cp.wait()
        rows = jnp.minimum(np.int32(chunk), n_live - c * np.int32(chunk))
        return tuple(_gather_rows_multi(read, rows, pts, list(accs), cells))

    zeros = tuple(jnp.zeros(p[0].shape, jnp.float32) for p in pts)
    return list(jax.lax.fori_loop(0, -(-n_live // chunk), chunk_body,
                                  zeros))


def _vlp_mega_kernel(scalars_ref, gridp_ref, tbl_ref, vlp_ref, out_ref,
                     *scratch, width: int, spp: int, scn_const, neg_t: bool,
                     nt: int, nv: int, n_chunks: int = 0,
                     grid_mode: bool = False):
    k0 = scalars_ref[0, 0]
    k1 = scalars_ref[0, 1]
    spp_offset = scalars_ref[0, 2]
    spp_total = scalars_ref[0, 3]
    row_offset = scalars_ref[0, 4]
    # live-VLP count (compacted to the front of the table, film_vlp_mega);
    # int32: the ceil-div loop bounds negate it
    n_live = scalars_ref[0, 5].astype(jnp.int32)

    tile = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 0)
    p_local = tile * _TILE + sub * 128 + lane
    w = np.int32(width)
    ii_i = p_local % w
    jj_row = p_local // w
    row_off_i = row_offset.astype(jnp.int32)
    ii = ii_i.astype(jnp.float32)
    jj = (jj_row + row_off_i).astype(jnp.float32)
    pixel_index = ((jj_row + row_off_i) * w + ii_i).astype(_U32)
    one = np.float32(1.0)

    lights = scn_const["lights"]
    nlights = len(lights)
    inv_nl = np.float32(1.0 / nlights) if nlights else np.float32(0.0)

    tri = {"mode": "smem", "nt": nt, "tbl": tbl_ref}

    def lane_cell(x, y, z):
        # grid mode: the lane's cell index (f32 - exact below 2^24) and
        # in-box flag (gather_vlps_grid's unclipped floor + per-axis
        # bounds check, the intended math).  vmin/cell/res are runtime
        # scalars: the staged CLI pipeline passes the grid across a jit
        # boundary, so even res is traced there.
        if not grid_mode:
            return None
        cxf = jnp.floor((x - gridp_ref[0, 0]) / gridp_ref[0, 3])
        cyf = jnp.floor((y - gridp_ref[0, 1]) / gridp_ref[0, 4])
        czf = jnp.floor((z - gridp_ref[0, 2]) / gridp_ref[0, 5])
        in_box = ((cxf >= 0) & (cxf < gridp_ref[0, 6])
                  & (cyf >= 0) & (cyf < gridp_ref[0, 7])
                  & (czf >= 0) & (czf < gridp_ref[0, 8]))
        return (cxf, cyf, czf, in_box)

    def shadow_geo(ray_id, x, y, z):
        # jittered direction + UN-jittered distance cap per light
        # (ocl:191-201)
        ldirs, tls = [], []
        for i, (lx, ly, lz, li) in enumerate(lights):
            site = np.uint32((C.SITE_LIGHT0 + i) * 8)
            u0, u1 = _threefry(k0, k1, ray_id, jnp.full_like(ray_id, site))
            u1f, u2f = _unit(u0), _unit(u1)
            ldx = np.float32(lx) + u1f - x
            ldy = np.float32(ly) + u2f - y
            ldz = np.float32(lz) - z
            ldirs.append(_normalize3(ldx, ldy, ldz))
            dqx = np.float32(lx) - x
            dqy = np.float32(ly) - y
            dqz = np.float32(lz) - z
            tls.append(jnp.sqrt(dqx * dqx + dqy * dqy + dqz * dqz))
        return ldirs, tls

    def sample_group_body(g, acc, G):
        """G spp samples per iteration: primary scans, the VLP gather and
        all (sample, light) shadow rays each share one pass over their
        SMEM tables (same recipe as pallas_super's _SPP_GROUP; same
        accumulation order as the single loop -> bit-identical film)."""
        fr, fg, fb = acc
        prim, ray_ids = [], []
        for j in range(G):
            s32 = (g * G + j).astype(_U32) + spp_offset
            ray_id = pixel_index * spp_total + s32
            b0, b1 = _threefry(k0, k1, ray_id, jnp.zeros_like(ray_id))
            b2, b3 = _threefry(k0, k1, ray_id, jnp.ones_like(ray_id))
            r1, r2, r3, r4 = _unit(b0), _unit(b1), _unit(b2), _unit(b3)
            ox, oy, oz, dx, dy, dz = _primary_rays_k(ii, jj, r1, r2,
                                                     r3, r4)
            prim.append(((ox, oy, oz), (dx, dy, dz)))
            ray_ids.append(ray_id)
        traces = _trace_rays_shared(tri, prim, scn_const, neg_t)

        hits, pts, cells, shadow = [], [], [], []
        for j in range(G):
            t, m, nx, ny, nz = traces[j]
            (ox, oy, oz), (dx, dy, dz) = prim[j]
            x = ox + dx * t
            y = oy + dy * t
            z = oz + dz * t
            ldirs, tls = shadow_geo(ray_ids[j], x, y, z)
            shadow += [((x, y, z), d3, tl) for d3, tl in zip(ldirs, tls)]
            hits.append((m, x, y, dx, dy, dz, nx, ny, nz))
            pts.append(_gather_pt(x, y, z, nx, ny, nz))
            cells.append(lane_cell(x, y, z))

        # VLP gather, clamp to 1 (illum_vlp, ocl:166-189); non-shading
        # (sky) lanes never read ti in the epilogue
        if n_chunks:
            gsums = _gather_vlps_chunked_multi(vlp_ref, scratch[0],
                                               scratch[1], pts, n_live,
                                               cells)
        else:
            gsums = _gather_vlps_multi(vlp_ref, pts, n_live, cells)
        occs = _occluded_rays_shared(tri, shadow, scn_const, neg_t)

        for j in range(G):
            m, x, y, dx, dy, dz, nx, ny, nz = hits[j]
            ti = jnp.minimum(gsums[j], one)
            for i in range(nlights):
                occ = occs[j * nlights + i]
                ti = jnp.where(occ != 0, ti - inv_nl, ti)
            ti = ti * np.float32(0.25)
            sr, sg, sb = _shade_rgb(m, x, y, dx, dy, dz, nx, ny, nz, ti)
            fr, fg, fb = fr + sr, fg + sg, fb + sb
        return fr, fg, fb

    zero = jnp.zeros((_SUB, 128), jnp.float32)
    acc = (zero, zero, zero)
    G = _VLP_SPP_GROUP
    if spp >= G:
        acc = jax.lax.fori_loop(
            0, spp // G, functools.partial(sample_group_body, G=G), acc)
    for tail_s in range((spp // G) * G, spp):
        acc = sample_group_body(jnp.int32(tail_s), acc, G=1)
    fr, fg, fb = acc
    out_ref[pl.ds(0, _SUB), :] = fr * C.EXPOSURE
    out_ref[pl.ds(_SUB, _SUB), :] = fg * C.EXPOSURE
    out_ref[pl.ds(2 * _SUB, _SUB), :] = fb * C.EXPOSURE


def _tri_smem_bytes(nt: int) -> int:
    ntp = max(_TRI_UNROLL, -(-nt // _TRI_UNROLL) * _TRI_UNROLL)
    return ntp * 12 * 4


def supported(scn, quirks: Quirks, grid, tri_override) -> bool:
    """The VLP megakernel covers the render pass of the bidirectional/
    metropolis family - dense gather AND the grid-limited (_vlpgrid)
    gather, which runs as a cell-range-masked dense scan (module
    docstring): standard estimator quirks, brute-force primitives
    (models/bidirectional.py:36-85), and a triangle table that fits SMEM
    next to a VLP chunk (dense (8, 512) and grid (16, 256) chunks are
    both 16KB)."""
    return (tri_override is None
            and not quirks.shadow_carry_t
            and scn.lights.shape[0] <= 8
            and (_tri_smem_bytes(int(scn.tri_v0.shape[0]))
                 + 8 * _VLP_CHUNK * 4 + 96) <= _SMEM_BUDGET)


def film_vlp_mega(key, scn, vlps, width: int, height: int, spp: int,
                  spp_offset=0, spp_total: int | None = None,
                  quirks: Quirks = None, row_offset=0,
                  rows: int | None = None, interpret: bool = False,
                  force_chunked: bool | None = None, grid=None):
    """Drop-in for the accumulate_spp(sample_super(illum_fn=illum_vlp))
    composition on the supported family: returns the pre-ambient
    (rows, W, 3) float32 film.  ``vlps`` is the traced (V, 4) VLP table
    from ops/vlp.py::emit_vlps / models/metropolis.py::metropolis_vlps;
    ``grid`` an ops/grid.py::UniformGrid over the VLPs selects the
    grid-limited (_vlpgrid) gather (cell-range mask, module docstring)."""
    if spp_total is None:
        spp_total = spp
    if rows is None:
        rows = height
    neg_t = bool(quirks.accept_negative_t) if quirks is not None else False
    nt = int(scn.tri_v0.shape[0])
    ntp = max(_TRI_UNROLL, -(-nt // _TRI_UNROLL) * _TRI_UNROLL)
    tbl = np.zeros((ntp, 12), np.float32)
    if nt:
        from .intersect import _tri_table
        tbl[:nt] = _tri_table(scn)

    nv = int(vlps.shape[0])
    nvp = max(_VLP_UNROLL, -(-nv // _VLP_UNROLL) * _VLP_UNROLL)

    # live-first stable compaction + runtime row bound: a dead row
    # (I <= 0) contributes exactly +0.0 to every accumulator, so scanning
    # only the first n_live compacted rows is bit-identical to the full
    # scan - and typical tables are ~1% live (bidirectional 6/1024, MLT
    # 11/4096 at the bench configs; the reference scans all of them,
    # bidirectionalpathtracer.ocl:167).
    live = vlps[:, 3] > 0
    vlps = vlps[jnp.argsort(jnp.logical_not(live), stable=True)]
    n_live = jnp.sum(live).astype(_U32)

    p = vlps[:, :3]
    cols = [p, jnp.maximum(vlps[:, 3:4], 0.0),
            jnp.sum(p * p, axis=-1, keepdims=True)]
    grid_mode = grid is not None
    if grid_mode:
        # per-VLP clipped cell-index AABB, the exact binning of
        # build_grid_cellscan (radius 16*sqrt(I), dead VLPs' far boxes
        # clip to the corner cell - where they contribute 0 anyway).
        # Everything grid-derived stays dynamic: the staged CLI pipeline
        # passes the grid across a jit boundary, where res is traced too.
        vi_raw = vlps[:, 3]
        radius = 16.0 * jnp.sqrt(jnp.maximum(vi_raw, 0.0))
        ok = vi_raw > 0
        far = jnp.float32(3.0e38)
        amin = jnp.where(ok[:, None], p - radius[:, None], far)
        amax = jnp.where(ok[:, None], p + radius[:, None], far)
        res_f = jnp.asarray(grid.res, jnp.float32).reshape(3)
        clo = jnp.clip(jnp.floor((amin - grid.vmin) / grid.cell_size),
                       0.0, res_f - 1.0)
        chi = jnp.clip(jnp.floor((amax - grid.vmin) / grid.cell_size),
                       0.0, res_f - 1.0)
        cols += [clo, chi]
        gridp = jnp.concatenate(
            [jnp.asarray(grid.vmin, jnp.float32).reshape(3),
             jnp.asarray(grid.cell_size, jnp.float32).reshape(3),
             res_f, jnp.zeros(7, jnp.float32)]).reshape(1, 16)
        ncols, srows, chunk = 11, 16, _VLP_CHUNK_GRID
    else:
        gridp = jnp.zeros((1, 16), jnp.float32)
        ncols, srows, chunk = 5, 8, _VLP_CHUNK
    vtab = jnp.concatenate(cols, axis=1)

    # direct mode: the whole table in SMEM; streaming mode (large V): the
    # transposed table in HBM, DMA'd chunk by chunk into an SMEM scratch
    chunked = (_tri_smem_bytes(nt) + nvp * ncols * 4 + 96) > _SMEM_BUDGET
    if force_chunked is not None:
        chunked = force_chunked
    if chunked:
        nvp = -(-nv // chunk) * chunk
        n_chunks = nvp // chunk
        # 8|16 rows: f32 sublane tiling; padded rows/columns never
        # contribute (I == 0)
        vtab = jnp.pad(vtab.T, ((0, srows - ncols), (0, nvp - nv)))
    else:
        n_chunks = 0
        vtab = jnp.pad(vtab, ((0, nvp - nv), (0, 0)))  # padded rows: I == 0

    R = width * rows
    n_tiles = -(-R // _TILE)
    scalars = jnp.stack([
        jnp.asarray(key[0], _U32), jnp.asarray(key[1], _U32),
        jnp.asarray(spp_offset, _U32), jnp.asarray(spp_total, _U32),
        jnp.asarray(row_offset, _U32), n_live,
        jnp.zeros((), _U32), jnp.zeros((), _U32)]).reshape(1, 8)

    if chunked:
        vlp_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes = [pltpu.SMEM((srows, chunk), jnp.float32),
                          pltpu.SemaphoreType.DMA]
    else:
        vlp_spec = pl.BlockSpec((nvp, ncols), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        scratch_shapes = []

    kernel = functools.partial(
        _vlp_mega_kernel, width=width, spp=spp,
        scn_const=_scene_const(scn), neg_t=neg_t, nt=nt, nv=nv,
        n_chunks=n_chunks, grid_mode=grid_mode)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ntp, 12), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vlp_spec,
        ],
        out_specs=pl.BlockSpec((3 * _SUB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 3 * _SUB, 128),
                                       jnp.float32),
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=R * spp * (150 * max(1, nt) + 20 * nv + 500),
            bytes_accessed=R * 12 + ntp * 48 + nvp * 4 * ncols,
            transcendentals=R * spp * (8 + nv),
        ),
        interpret=interpret,
    )(scalars, gridp, jnp.asarray(tbl), vtab)

    film = (out.reshape(n_tiles, 3, _SUB, 128)
            .transpose(0, 2, 3, 1)
            .reshape(n_tiles * _TILE, 3)[:R])
    return film.reshape(rows, width, 3)
