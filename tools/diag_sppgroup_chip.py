"""Interleaved on-chip A/B of _SPP_GROUP at the headline config.

Round 2 swept G on the pre-stacking kernel (G=2 286, G=4 290, G=8 263:
vreg pressure won at 8).  The round-3 unified stacked body changed the
register profile (one tall (G*SUB, 128) body instead of G separate
bodies), so the sweep may no longer hold.  This patches
pallas_super._SPP_GROUP per trace and alternates timed frames in ONE
session (tunnel noise spans days, interleaving is the only fair A/B).

Env: PT_AB_GROUPS (default "4,8"), PT_AB_SIZE (1024), PT_AB_SPP (1024),
PT_AB_ROUNDS (4).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene

SIZE = int(os.environ.get("PT_AB_SIZE", "1024"))
SPP = int(os.environ.get("PT_AB_SPP", "1024"))
GROUPS = [int(g) for g in os.environ.get("PT_AB_GROUPS", "4,8").split(",")]
ROUNDS = int(os.environ.get("PT_AB_ROUNDS", "4"))


def main():
    scn = prep_scene(demo_scene()[0])
    key = make_key(3)
    fns, films = {}, {}
    g_orig = M._SPP_GROUP
    try:
        for g in GROUPS:
            M._SPP_GROUP = g
            fn = jax.jit(lambda k, s=scn: M.film_super_mega(
                k, s, SIZE, SIZE, SPP))
            t0 = time.perf_counter()
            films[g] = np.asarray(fn(key))    # trace+compile under patch
            print(f"G={g}: compile+first {time.perf_counter() - t0:.0f}s "
                  f"mean {films[g].mean():.4f}", flush=True)
            fns[g] = fn
    finally:
        M._SPP_GROUP = g_orig

    ref = films[GROUPS[0]]
    for g in GROUPS[1:]:
        d = np.abs(films[g] - ref).max()
        print(f"G={g} vs G={GROUPS[0]}: max |diff| {d:.2e}")

    paths = SIZE * SIZE * SPP
    best = {g: float("inf") for g in GROUPS}
    for r in range(ROUNDS):
        for g in GROUPS:
            t0 = time.perf_counter()
            np.asarray(fns[g](key))
            dt = time.perf_counter() - t0
            best[g] = min(best[g], dt)
            print(f"round {r} G={g}: {dt * 1e3:7.1f} ms "
                  f"({paths / dt / 1e6:6.1f} Mpaths/s)", flush=True)
    for g in GROUPS:
        print(f"G={g}: best {best[g] * 1e3:7.1f} ms = "
              f"{paths / best[g] / 1e6:6.1f} Mpaths/s")


if __name__ == "__main__":
    main()
