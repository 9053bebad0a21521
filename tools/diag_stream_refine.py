"""Interleaved on-chip A/B: stream tier WITH the exact per-lane flag
refinement (_refine_flags_stream) vs the round-3 gate-only behavior, at
default 262k-triangle geometry, 512^2 x 4 amortized x8.

The refinement trims the interval gate's conservative superset (host sim
1.43x split gate at 262k; measured 1.70x wall clock at equal 65k
geometry, tools/diag_tier_gap.py) at the cost of per-chunk AABB DMAs +
gated per-block slab tests.  Films must be bit-identical (culling only
ever drops blocks no lane can hit).

Env: PT_DIAG_MESH=512,128 (262k default), PT_DIAG_ROUNDS=3,
PT_DIAG_SIZE=512.
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
MESH = tuple(int(x) for x in os.environ.get("PT_DIAG_MESH", "512,256")
             .split(","))
ROUNDS = int(os.environ.get("PT_DIAG_ROUNDS", "3"))


def main():
    key = make_key(9)
    base, _ = demo_scene()
    scn = prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=torus_mesh(n_major=MESH[0], n_minor=MESH[1]),
        lights=base.lights))
    nt = int(scn.tri_v0.shape[0])
    paths = SIZE * SIZE * SPP * FRAMES

    def make_many():
        # a FRESH closure per variant: jax caches traces on function
        # identity, so reusing one `many` under a flipped module global
        # silently reuses the first variant's jaxpr (measured: second
        # lower+compile 0s, identical timings)
        def many(key):
            def body(i, acc):
                k = (key[0] + i.astype(jnp.uint32), key[1])
                return acc + M.film_super_mega(k, scn, SIZE, SIZE, SPP,
                                               force_stream=True)
            return jax.lax.fori_loop(0, FRAMES, body,
                                     jnp.zeros((SIZE, SIZE, 3),
                                               jnp.float32))
        return many

    fns = {}
    for tag, refine in (("refined", True), ("gateonly", False)):
        M._STREAM_REFINE = refine
        # trace+lower eagerly under the right global (AOT compile)
        t0 = time.perf_counter()
        fns[tag] = jax.jit(make_many()).lower(key).compile()
        print(f"{tag}: lower+compile {time.perf_counter() - t0:.0f}s",
              flush=True)
    films = {}
    for tag, fn in fns.items():
        t0 = time.perf_counter()
        films[tag] = np.asarray(fn(key))
        print(f"{tag}: first run {time.perf_counter() - t0:.0f}s, "
              f"mean {films[tag].mean():.4f}", flush=True)
    dmax = float(np.abs(films["refined"] - films["gateonly"]).max())
    print(f"film max|diff| = {dmax:.2e}  (must be 0: culling is exact)",
          flush=True)

    best = {t: float("inf") for t in fns}
    for r in range(ROUNDS):
        for tag, fn in fns.items():
            t0 = time.perf_counter()
            np.asarray(fn(key))
            dt = time.perf_counter() - t0
            best[tag] = min(best[tag], dt)
            print(f"round {r} {tag:8s}: {dt * 1e3:8.1f} ms "
                  f"({paths / dt / 1e6:6.2f} Mpaths/s)", flush=True)
    a, b = best["refined"], best["gateonly"]
    print(f"nt={nt}: refined {paths / a / 1e6:.2f} vs gate-only "
          f"{paths / b / 1e6:.2f} Mpaths/s -> refinement {b / a:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
