"""Ablate the take-list blocked scan to find where the frame time goes.

Variants (monkeypatched, WRONG images - timing only), torus at SIZE^2 x 4,
amortized over FRAMES in-jit calls (per-call dispatch ~27 ms otherwise
drowns the decomposition):
  full        shipped pipeline (baseline)
  zeroflags   _block_flags replaced by "write zero flags": no slab tests,
              no mat stores; build+scan run on empty flags
              -> prepass cost = full - zeroflags - scan
  noscan      _take_list returns 0: prepass+flag DMA run, scan loop empty
              -> scan cost = full - noscan
  buildonly   zeroflags AND empty scan -> take-list build + DMA + loop
              skeleton alone
  noslab      slab replaced by a constant compare (no aabb SMEM reads)
              -> isolates the SMEM-scalar->vector broadcast cost

Env: PT_DIAG_MESH="256,128" torus density (default 144,72 = 20k),
PT_DIAG_SIZE (default 512 - content in the fixed camera frame; 256 is a
pure-sky window), PT_DIAG_FRAMES (default 4).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from tools.diag_blocked import big_scene

SIZE = int(os.environ.get("PT_DIAG_SIZE", "512"))
SPP = 4
FRAMES = int(os.environ.get("PT_DIAG_FRAMES", "4"))
_MESH = tuple(int(x) for x in
              os.environ.get("PT_DIAG_MESH", "144,72").split(","))


def bench(fn, key, repeats=3, tag=""):
    t0 = time.perf_counter()
    film = np.asarray(fn(key))
    t_first = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(fn(key))
        times.append(time.perf_counter() - t0)
    print(f"{tag}: first {t_first:.0f} s, best {min(times) * 1e3:.1f} ms, "
          f"mean {film.mean():.4f}", flush=True)
    return min(times), film


orig_pre = M._flag_prepass
orig_take = M._take_list


def zeroflags(tri, box_test, bundles, neg_t, b0=0, bn=None):
    """No slab tests, no mat stores: zero flags for the whole padded
    array + one DMA (interval masks too, so the gated build sees
    zeros)."""
    v, s = tri["flags_v"], tri["flags_s"]
    v[pl.ds(0, v.shape[0]), :] = jnp.zeros(v.shape, jnp.int32)
    cp = pltpu.make_async_copy(v, s, tri["fsem"])
    cp.start()
    cp.wait()
    iv, is_ = tri["iflags_v"], tri["iflags_s"]
    iv[...] = jnp.zeros(iv.shape, jnp.int32)
    cp = pltpu.make_async_copy(iv, is_, tri["fsem"])
    cp.start()
    cp.wait()


def noscan(tri, b0=0, bn=None):
    return jnp.int32(0)


def scanall(tri, b0=0, bn=None):
    """Identity take-list over the whole range: scan EVERY block.
    (frame_time - noscan) / total_blocks = per-block DMA+row-scan cost."""
    list_s = tri["list"]
    nb = tri["n_blocks"]
    if bn is None:
        bn = nb - b0
    for b in range(b0, b0 + bn):
        list_s[0, b - b0] = b
    return jnp.int32(bn)


def noslab(tri, box_test, bundles, neg_t, b0=0, bn=None):
    """Real prepass structure, but box_test reads constant AABB scalars
    instead of SMEM - isolates the SMEM-scalar->vector broadcast cost.
    The constant box is unhittable, so flags (and scans) are empty."""
    a6c = [np.float32(v) for v in (2e9, 2e9, 2e9, 1e9, 1e9, 1e9)]
    orig_pre(tri, lambda a6: box_test(a6c), bundles, neg_t, b0, bn)


def main():
    key = make_key(7)
    scn = big_scene(*_MESH)
    paths = SIZE * SIZE * SPP * FRAMES

    only = os.environ.get("PT_DIAG_ONLY")  # comma-separated tag prefixes

    def run(tag):
        if only and not any(tag.startswith(p) for p in only.split(",")):
            return

        def many(k):
            def body(i, acc):
                kk = (k[0] + i.astype(jnp.uint32), k[1])
                return acc + M.film_super_mega(kk, scn, SIZE, SIZE, SPP)
            return jax.lax.fori_loop(
                0, FRAMES, body,
                jnp.zeros((SIZE, SIZE, 3), jnp.float32))

        fn = jax.jit(many)
        best, _ = bench(fn, key, tag=tag)
        print(f"  -> {best * 1e3 / FRAMES:.1f} ms/frame, "
              f"{paths / best / 1e6:.1f} Mpaths/s", flush=True)

    run("full     ")
    M._flag_prepass = zeroflags
    run("zeroflags")
    M._take_list = noscan
    run("buildonly")
    M._flag_prepass = orig_pre
    run("noscan   ")
    M._take_list = scanall
    run("scanall  ")
    M._take_list = orig_take
    M._flag_prepass = noslab
    run("noslab   ")
    M._flag_prepass = orig_pre


if __name__ == "__main__":
    main()
