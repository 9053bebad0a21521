"""Diagnose where the blocked-scan frame time goes on a large mesh.

Measures the 20k-triangle torus config (256^2 x 4 spp, the docs/PERF.md
"Large meshes" row) three ways:

  baseline   the shipped per-block any-lane slab skip (lax.cond per block)
  scan-all   cond removed: every block DMA'd + scanned (isolates the cost
             of the row scans themselves)
  scan-none  cond forced false via a traced scalar (isolates the cost of
             the loop + slab + any + cond machinery with no scan work)

If baseline ~= scan-none + taken-fraction * scan-all's work, the per-block
sync (vector->scalar any + cond) dominates and skipping saves nothing.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
    demo_scene, torus_mesh)
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene


def big_scene(n_major=144, n_minor=72):
    base, _ = demo_scene()
    return prep_scene(Scene(
        sphere_centers=base.sphere_centers,
        square_kj=base.square_kj,
        triangles=torus_mesh(n_major=n_major, n_minor=n_minor),
        lights=base.lights,
    ))


def bench(fn, key, repeats=3, tag=""):
    t0 = time.perf_counter()
    film = np.asarray(fn(key))
    t_first = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(fn(key))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{tag}: first {t_first * 1e3:.0f} ms, best {best * 1e3:.1f} ms, "
          f"mean_film {film.mean():.4f}", flush=True)
    return best, film


_orig_scan = M._tri_scan_blocked


def _scan_all(tri, ox, oy, oz, dx, dy, dz, neg_t, occ_tl, carry, row_update):
    """Variant: scan every block unconditionally."""
    tbl_any = tri["tbl"]
    scratch = tri["scratch"]
    sem = tri["sem"]

    def blk(b, carry):
        from jax.experimental.pallas import tpu as pltpu
        import jax.experimental.pallas as pl
        cp = pltpu.make_async_copy(
            tbl_any.at[:, pl.ds(b * M._TRI_BLOCK, M._TRI_BLOCK)],
            scratch, sem)
        cp.start()
        cp.wait()

        def rows(i, c):
            for u in range(M._TRI_UNROLL):
                rr = i * M._TRI_UNROLL + u
                r = [scratch[j, rr] for j in range(13)]
                c = row_update(r, c)
            return c

        return jax.lax.fori_loop(0, M._TRI_BLOCK // M._TRI_UNROLL, rows,
                                 carry)

    return jax.lax.fori_loop(0, tri["n_blocks"], blk, carry)


def _scan_none(tri, ox, oy, oz, dx, dy, dz, neg_t, occ_tl, carry,
               row_update):
    """Variant: full slab + any + cond machinery, but the predicate is
    AND'd with a data-dependent always-false term so the body never runs
    (and nothing constant-folds)."""
    aabb_ref = tri["aabb"]
    tbl_any = tri["tbl"]
    scratch = tri["scratch"]
    sem = tri["sem"]
    one = np.float32(1.0)
    inv_dx, inv_dy, inv_dz = one / dx, one / dy, one / dz
    never = ox > np.float32(1e30)   # data-dependent false

    def blk(b, carry):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        a6 = [aabb_ref[b, j] for j in range(6)]
        tmin, tmax = M._slab(a6, ox, oy, oz, inv_dx, inv_dy, inv_dz)
        hit = (tmax >= tmin) & never

        def do(carry):
            cp = pltpu.make_async_copy(
                tbl_any.at[:, pl.ds(b * M._TRI_BLOCK, M._TRI_BLOCK)],
                scratch, sem)
            cp.start()
            cp.wait()

            def rows(i, c):
                for u in range(M._TRI_UNROLL):
                    rr = i * M._TRI_UNROLL + u
                    r = [scratch[j, rr] for j in range(13)]
                    c = row_update(r, c)
                return c

            return jax.lax.fori_loop(0, M._TRI_BLOCK // M._TRI_UNROLL,
                                     rows, carry)

        return jax.lax.cond(jnp.any(hit), do, lambda c: c, carry)

    return jax.lax.fori_loop(0, tri["n_blocks"], blk, carry)


def main():
    scn = big_scene()
    nt = int(scn.tri_v0.shape[0])
    size, spp = 256, 4
    paths = size * size * spp
    print(f"triangles: {nt}; config {size}^2 x {spp} spp", flush=True)

    def render(key):
        return M.film_super_mega(key, scn, size, size, spp)

    fn = jax.jit(render)
    key = make_key(7)
    best, film0 = bench(fn, key, tag="baseline (any-lane cond)")
    print(f"  -> {paths / best / 1e6:.2f} Mpaths/s", flush=True)

    for name, variant in (("scan-all", _scan_all),
                          ("scan-none", _scan_none)):
        M._tri_scan_blocked = variant
        fnv = jax.jit(render)
        best, film = bench(fnv, key, tag=name)
        print(f"  -> {paths / best / 1e6:.2f} Mpaths/s, "
              f"max|diff| vs baseline {np.abs(film - film0).max():.2e}",
              flush=True)
        M._tri_scan_blocked = _orig_scan


if __name__ == "__main__":
    main()
