"""Interleaved on-chip A/B of _SPP_GROUP on the BLOCKED tier.

The SMEM-tier sweep (tools/diag_sppgroup_chip.py) measures the 96-tri
headline config, where G only divides the SMEM row reads.  On the
blocked tier G also divides the take-list prepass and the per-block
AABB DMA (G samples share one union take-list), so its optimum can sit
higher.  This patches pallas_super._SPP_GROUP_BLOCKED per trace and alternates
amortized frames on the 20k torus in ONE session (tunnel noise spans
days; interleaving is the only fair A/B).

Env: PT_AB_GROUPS (default "2,4"), PT_AB_MESH (144,72 = 20k),
PT_AB_SIZE (512), PT_AB_SPP (8), PT_AB_FRAMES (8), PT_AB_ROUNDS (3).
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

SIZE = int(os.environ.get("PT_AB_SIZE", "512"))
SPP = int(os.environ.get("PT_AB_SPP", "8"))
FRAMES = int(os.environ.get("PT_AB_FRAMES", "8"))
MESH = tuple(int(x) for x in os.environ.get("PT_AB_MESH", "144,72")
             .split(","))
GROUPS = [int(g) for g in os.environ.get("PT_AB_GROUPS", "2,4").split(",")]
ROUNDS = int(os.environ.get("PT_AB_ROUNDS", "3"))


def main():
    base, _ = demo_scene()
    scn = prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=torus_mesh(n_major=MESH[0], n_minor=MESH[1]),
        lights=base.lights))
    nt = int(scn.tri_v0.shape[0])
    paths = SIZE * SIZE * SPP * FRAMES
    key = make_key(7)
    fns, films = {}, {}
    g_orig = M._SPP_GROUP_BLOCKED
    try:
        for g in GROUPS:
            M._SPP_GROUP_BLOCKED = g

            def many(key, _g=g):
                def body(i, acc):
                    k = (key[0] + i.astype(jnp.uint32), key[1])
                    f = M.film_super_mega(k, scn, SIZE, SIZE, SPP)
                    return acc + f
                return jax.lax.fori_loop(
                    0, FRAMES, body,
                    jnp.zeros((SIZE, SIZE, 3), jnp.float32))

            fn = jax.jit(many)
            t0 = time.perf_counter()
            films[g] = np.asarray(fn(key))
            print(f"G={g} (nt={nt}): compile+first "
                  f"{time.perf_counter() - t0:.0f}s "
                  f"mean {films[g].mean():.4f}", flush=True)
            fns[g] = fn
    finally:
        M._SPP_GROUP_BLOCKED = g_orig
    ref = films[GROUPS[0]]
    for g in GROUPS[1:]:
        print(f"G={g} vs G={GROUPS[0]}: max |diff| "
              f"{np.abs(films[g] - ref).max():.2e}", flush=True)
    best = {g: float("inf") for g in GROUPS}
    for r in range(ROUNDS):
        for g in GROUPS:
            t0 = time.perf_counter()
            np.asarray(fns[g](key))
            dt = time.perf_counter() - t0
            best[g] = min(best[g], dt)
            print(f"round {r} G={g}: {dt * 1e3:8.1f} ms "
                  f"({paths / dt / 1e6:6.1f} Mpaths/s)", flush=True)
    for g in GROUPS:
        print(f"G={g}: best {best[g] * 1e3:8.1f} ms = "
              f"{paths / best[g] / 1e6:6.1f} Mpaths/s", flush=True)


if __name__ == "__main__":
    main()
