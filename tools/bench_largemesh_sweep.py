"""Large-mesh scaling sweep for docs/PERF.md (VERDICT r2 task 1).

Measures the take-list blocked megakernel at 96 / 1k / 5k / 20k / 65k
triangles, and the interval-stream tier at 262k / 1M (demo scene,
triangles swapped for denser tori) at 512^2 x 4, both per-call (includes
the ~27 ms tunnel call overhead) and in-jit amortized over several
frames (kernel throughput).
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

SIZE = 512
SPP = 4
FRAMES = 8
REPEATS = 3

MESHES = [
    ("96 (reference)", None),
    ("1k", (16, 32)),
    ("5k", (50, 50)),
    ("20k", (144, 72)),
    ("65k", (256, 128)),
    ("262k (stream)", (512, 256)),
    ("1M (stream)", (1024, 512)),
]


def scene_for(nm):
    # round 4: ripple sheets (visible at every density) replace the
    # dense tori, whose triangles fell under the reference's det cutoff
    # past ~5k and could never shade a pixel (docs/PERF.md)
    base, _ = demo_scene()
    if nm is None:
        return prep_scene(base)
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
        ripple_sheet_mesh)
    # tori are only visible up to ~1k triangles (min |e0 x e2| drops
    # under the 0.01 cutoff: 0.0067 at 1k, 0.0014 at 5k) - every dense
    # tier uses the sheet
    tris = ripple_sheet_mesh(nm[0], nm[1])
    return prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=tris, lights=base.lights))


def bench(fn, key, repeats=REPEATS):
    t0 = time.perf_counter()
    film = np.asarray(fn(key))
    first = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(fn(key))
        times.append(time.perf_counter() - t0)
    return first, min(times), film


def main():
    key = make_key(9)
    only = os.environ.get("SWEEP_ONLY")  # comma-separated tag prefixes
    # SWEEP_FORCE_STREAM=1 routes every mesh through the interval-stream
    # tier (A/B vs the exact-blocked default at 20k/65k)
    fstream = bool(int(os.environ.get("SWEEP_FORCE_STREAM", "0"))) or None
    meshes = MESHES if not only else [
        (t, nm) for t, nm in MESHES
        if any(t.startswith(p) for p in only.split(","))]
    for tag, nm in meshes:
        scn = scene_for(nm)
        nt = int(scn.tri_v0.shape[0])
        fn = jax.jit(lambda k, s=scn: M.film_super_mega(
            k, s, SIZE, SIZE, SPP, force_stream=fstream))
        first, best, film = bench(fn, key)
        paths = SIZE * SIZE * SPP
        percall = paths / best / 1e6

        def many(key, s=scn):
            def body(i, acc):
                k = (key[0] + i.astype(jnp.uint32), key[1])
                return acc + M.film_super_mega(k, s, SIZE, SIZE, SPP,
                                               force_stream=fstream)
            return jax.lax.fori_loop(0, FRAMES, body,
                                     jnp.zeros((SIZE, SIZE, 3), jnp.float32))
        fn_a = jax.jit(many)
        first_a, best_a, _ = bench(fn_a, key)
        amort = paths * FRAMES / best_a / 1e6
        print(f"{tag:15s} nt={nt:5d}: per-call {best * 1e3:7.1f} ms "
              f"({percall:6.2f} Mpaths/s), amortized x{FRAMES} "
              f"{amort:6.2f} Mpaths/s  [compiles {first:.0f}s/{first_a:.0f}s, "
              f"mean {film.mean():.4f}]", flush=True)


if __name__ == "__main__":
    main()
