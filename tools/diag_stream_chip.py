"""On-chip cost decomposition of the interval-stream tier (262k tris).

The first stream measurement (512^2 x 4, per-call) landed at 0.34
Mpaths/s vs the 65k exact tier's ~4x-fewer-triangle 23.8 amortized - a
~65x cliff that the host-simulated 2.5x block-scan superset cannot
explain.  This tool splits the frame on the real chip:

  full      2 lights (the shipped config)
  nolight   0 lights (primary closest-hit only: no shadow bundles)
  oneseg    2 lights, _SEG raised so the 2048-block mesh runs as ONE
            segment (ablates the per-segment prepass/DMA overhead)

Env: PT_DIAG_MESH=512,256 (default), PT_DIAG_CASES=full,nolight,oneseg
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
    demo_scene, torus_mesh)
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene

SIZE = int(os.environ.get("PT_DIAG_SIZE", "512"))
SPP = 4
MESH = tuple(int(x) for x in os.environ.get("PT_DIAG_MESH", "512,256")
             .split(","))


def scene_with_lights(nlights: int):
    base, _ = demo_scene()
    return prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=torus_mesh(n_major=MESH[0], n_minor=MESH[1]),
        lights=np.asarray(base.lights)[:nlights].reshape(-1, 4)))


def bench(fn, key, repeats=2, tag=""):
    t0 = time.perf_counter()
    film = np.asarray(fn(key))
    first = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        film = np.asarray(fn(key))
        times.append(time.perf_counter() - t0)
    best = min(times)
    paths = SIZE * SIZE * SPP
    print(f"{tag:28s}: {best * 1e3:8.1f} ms ({paths / best / 1e6:6.2f} "
          f"Mpaths/s) [compile {first:.0f}s, mean {film.mean():.4f}]",
          flush=True)
    return best


def main():
    key = make_key(9)
    cases = os.environ.get("PT_DIAG_CASES", "full,nolight,oneseg").split(",")
    rounds = int(os.environ.get("PT_DIAG_ROUNDS", "0"))
    compiled = []
    for case in cases:
        nl = 0 if case == "nolight" else 2
        scn = scene_with_lights(nl)
        old_seg = M._SEG
        if case == "oneseg":
            M._SEG = 4096   # 262k tris = 2048 blocks -> one segment
        try:
            fn = jax.jit(lambda k, s=scn: M.film_super_mega(
                k, s, SIZE, SIZE, SPP, force_stream=True))
            bench(fn, key, tag=f"{case} (lights={nl}, SEG={M._SEG})")
            compiled.append((case, fn))
        except Exception as e:  # noqa: BLE001 - keep later cases running
            print(f"{case}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            M._SEG = old_seg

    # PT_DIAG_ROUNDS > 0: alternate the already-compiled cases in one
    # session (tunnel run noise spans 20-40% across calls; only
    # interleaved runs make a per-case delta attributable)
    if rounds and len(compiled) > 1:
        best = {c: 1e9 for c, _ in compiled}
        for r in range(rounds):
            for c, fn in compiled:
                t0 = time.perf_counter()
                np.asarray(fn(key))
                dt = time.perf_counter() - t0
                best[c] = min(best[c], dt)
                print(f"round {r} {c}: {dt * 1e3:8.1f} ms", flush=True)
        paths = SIZE * SIZE * SPP
        for c, _ in compiled:
            print(f"interleaved best {c}: {best[c] * 1e3:8.1f} ms "
                  f"({paths / best[c] / 1e6:6.2f} Mpaths/s)", flush=True)


if __name__ == "__main__":
    main()
