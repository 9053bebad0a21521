"""On-chip A/B for the O(1)-program-size stream segment loop
(pallas_super._seg_loop): the SAME 65k mesh forced-stream, once with
_SEG=1024 (512 blocks -> ONE segment, static path) and once with
_SEG=256 (TWO segments -> the dynamic lax.fori body with a traced
segment base).  Blocks are scanned in the same ascending take-list
order either way, so the films must be BIT-IDENTICAL - any diff means
the traced-base indexing (gate-slice DMA, refine-chunk DMA, take-list
ids) is wrong on hardware, not just in interpret mode.  Interleaved
timing bounds the fori/segmentation overhead in the same session
(CLAUDE.md: cross-day comparisons are +-20-40% noise).

Each variant is a FRESH closure compiled while its _SEG patch is
active (JAX's tracing cache keys on callable identity - re-jitting the
same fn would silently reuse the first trace).

Env: PT_DIAG_MESH=256,128  PT_DIAG_SIZE=512  PT_DIAG_ROUNDS=3
     PT_DIAG_SEGS=1024,256
"""

from __future__ import annotations

import os
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

SIZE = int(os.environ.get("PT_DIAG_SIZE", "512"))
SPP = 4
FRAMES = 8
MESH = tuple(int(x) for x in os.environ.get("PT_DIAG_MESH", "256,128")
             .split(","))
ROUNDS = int(os.environ.get("PT_DIAG_ROUNDS", "3"))
SEGS = tuple(int(x) for x in os.environ.get("PT_DIAG_SEGS", "1024,256")
             .split(","))


def main():
    key = make_key(9)
    base, _ = demo_scene()
    scn = prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=torus_mesh(n_major=MESH[0], n_minor=MESH[1]),
        lights=base.lights))
    nt = int(scn.tri_v0.shape[0])
    nb = -(-nt // M._TRI_BLOCK)
    paths = SIZE * SIZE * SPP * FRAMES

    def many(key):
        def body(i, acc):
            k = (key[0] + i.astype(jnp.uint32), key[1])
            return acc + M.film_super_mega(k, scn, SIZE, SIZE, SPP,
                                           force_stream=True)
        return jax.lax.fori_loop(0, FRAMES, body,
                                 jnp.zeros((SIZE, SIZE, 3), jnp.float32))

    fns = {}
    for seg in SEGS:
        prev = M._SEG
        M._SEG = seg
        try:
            fn = jax.jit(lambda k, _seg=seg: many(k))
            t0 = time.perf_counter()
            compiled = fn.lower(key).compile()
            n_seg = -(-nb // seg)
            print(f"_SEG={seg} ({n_seg} segment(s), "
                  f"{'dynamic fori' if n_seg > 1 else 'static'}): "
                  f"compile {time.perf_counter() - t0:.0f}s", flush=True)
        finally:
            M._SEG = prev
        fns[seg] = compiled

    films = {}
    for seg, fn in fns.items():
        films[seg] = np.asarray(fn(key))
        print(f"_SEG={seg}: mean {films[seg].mean():.4f}", flush=True)
    segs = list(fns)
    dmax = float(np.abs(films[segs[0]] - films[segs[1]]).max())
    print(f"film max|diff| = {dmax:.2e}  (must be 0: same scan order)",
          flush=True)

    best = {s: float("inf") for s in fns}
    for r in range(ROUNDS):
        for seg, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(key))
            dt = time.perf_counter() - t0
            best[seg] = min(best[seg], dt)
            print(f"round {r} _SEG={seg:5d}: {dt * 1e3:8.1f} ms "
                  f"({paths / dt / 1e6:6.2f} Mpaths/s)", flush=True)
    a, b = best[segs[0]], best[segs[1]]
    print(f"nt={nt}: _SEG={segs[0]} {paths / a / 1e6:.2f} vs "
          f"_SEG={segs[1]} {paths / b / 1e6:.2f} Mpaths/s "
          f"-> ratio {b / a:.2f}x", flush=True)


if __name__ == "__main__":
    main()
