"""Occupancy-model corroboration sweep (VERDICT round 2 weak #4).

Benches the super megakernel at nt in {24, 48, 96, 192} triangles (the
reference scene truncated / doubled), fits the per-triangle-row cost from
the measured times, and compares against the op-accounting model that
backs the docs/PERF.md MFU claim (~48 VPU f32 ops per (ray, triangle)
pair, 3 table passes per path).

Per-call tunnel overhead (~27 ms) is amortized by rendering several
frames inside one jit; min of repeats.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene

SIZE = 512
SPP = 64
FRAMES = 4
REPEATS = 5


def scene_with_nt(nt: int):
    base, _ = demo_scene()
    tris = base.triangles
    reps = -(-nt // len(tris))
    tris = np.concatenate([tris] * reps)[:nt]
    return prep_scene(Scene(sphere_centers=base.sphere_centers,
                            square_kj=base.square_kj,
                            triangles=tris, lights=base.lights))


def bench_nt(nt: int):
    scn = scene_with_nt(nt)

    def many(key):
        def body(i, acc):
            k = (key[0] + i.astype(jnp.uint32), key[1])
            return acc + M.film_super_mega(k, scn, SIZE, SIZE, SPP)
        return jax.lax.fori_loop(0, FRAMES, body,
                                 jnp.zeros((SIZE, SIZE, 3), jnp.float32))

    fn = jax.jit(many)
    key = make_key(11)
    np.asarray(fn(key))
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        np.asarray(fn(key))
        times.append(time.perf_counter() - t0)
    best = min(times)
    paths = SIZE * SIZE * SPP * FRAMES
    print(f"nt={nt:4d}: best {best * 1e3:.1f} ms -> "
          f"{paths / best / 1e6:.1f} Mpaths/s", flush=True)
    return best


def main():
    nts = [24, 48, 96, 192]
    times = [bench_nt(nt) for nt in nts]
    paths = SIZE * SIZE * SPP * FRAMES
    # linear fit t = a + b * nt
    A = np.vstack([np.ones(len(nts)), nts]).T
    (a, b), *_ = np.linalg.lstsq(A, np.asarray(times), rcond=None)
    per_path_fixed = a / paths
    per_path_row = b / paths
    print(f"fit: t = {a * 1e3:.1f} ms + {b * 1e6:.3f} us/tri")
    print(f"per path: fixed {per_path_fixed * 1e9:.1f} ns + "
          f"{per_path_row * 1e12:.2f} ps/tri-row")
    # VPU ops implied by the fitted row cost at v5e peak
    peak = 3.85e12  # f32 ops/s (8x128 lanes x 4 ALUs x 940 MHz)
    ops_per_row = per_path_row * peak
    print(f"implied ops/(path*tri-row) at VPU peak: {ops_per_row:.1f} "
          f"(op-accounting model: ~48 x 2 shared passes ~ 96-144)")


if __name__ == "__main__":
    main()
