"""Interleaved on-chip A/B: exact-blocked tier vs forced-stream tier at
EQUAL geometry (default: the 65k torus), 512^2 x 4 amortized x8.

Motivation (round 3): the blocked tier scales 1k -> 65k (64x triangles)
at only 2.3x cost, so 65k -> 262k (4x) "should" cost ~1.4x (~17
Mpaths/s) - yet the stream tier measures 5.4.  The host-simulated gate
superset explains only ~1.35x at 65k (split gate vs exact union).  This
tool measures the FULL tier gap with geometry held fixed, interleaving
the two programs in one session so tunnel drift cannot fake a
conclusion (CLAUDE.md: same-day numbers vary +-20-40%).

Env: PT_DIAG_MESH=256,128 (65k default), PT_DIAG_ROUNDS=3.
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


def main():
    key = make_key(9)
    base, _ = demo_scene()
    scn = prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=torus_mesh(n_major=MESH[0], n_minor=MESH[1]),
        lights=base.lights))
    nt = int(scn.tri_v0.shape[0])
    paths = SIZE * SIZE * SPP * FRAMES

    def many(key, force_stream):
        def body(i, acc):
            k = (key[0] + i.astype(jnp.uint32), key[1])
            return acc + M.film_super_mega(k, scn, SIZE, SIZE, SPP,
                                           force_stream=force_stream)
        return jax.lax.fori_loop(0, FRAMES, body,
                                 jnp.zeros((SIZE, SIZE, 3), jnp.float32))

    fns = {"blocked": jax.jit(lambda k: many(k, False)),
           "stream": jax.jit(lambda k: many(k, True))}
    films = {}
    for tag, fn in fns.items():
        t0 = time.perf_counter()
        films[tag] = np.asarray(fn(key))
        print(f"{tag}: compile+first {time.perf_counter() - t0:.0f}s, "
              f"mean {films[tag].mean():.4f}", flush=True)
    dmax = float(np.abs(films["blocked"] - films["stream"]).max())
    print(f"film max|diff| = {dmax:.2e}  (razor-edge class expected only)",
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
    b, s = best["blocked"], best["stream"]
    print(f"nt={nt}: blocked {paths / b / 1e6:.2f} vs stream "
          f"{paths / s / 1e6:.2f} Mpaths/s -> tier gap {s / b:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
