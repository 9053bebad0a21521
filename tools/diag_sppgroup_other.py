"""Interleaved on-chip A/B of the spp-group constant in the SIMPLE and
VLP (bidirectional) megakernels.

Round 3's sublane bundle stacking changed the vreg profile of all three
megakernels; the super kernel's sweep moved its SMEM-tier optimum from
G=4 to G=1 (tools/diag_sppgroup_chip.py).  This re-sweeps the other
two: pallas_simple._SPP_GROUP and pallas_bpt._VLP_SPP_GROUP, patched
per trace (the film_* kernels are jitted directly so every G's program
stays resident), frames alternated in ONE session (tunnel noise spans
days; interleaving is the only fair A/B).

Env: PT_AB_KERNEL ("simple" | "vlp"), PT_AB_GROUPS (default "1,2,4"),
PT_AB_SIZE (1024 simple / 512 vlp), PT_AB_SPP (256), PT_AB_ROUNDS (3).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene

KERNEL = os.environ.get("PT_AB_KERNEL", "simple")
GROUPS = [int(g) for g in os.environ.get("PT_AB_GROUPS", "1,2,4").split(",")]
ROUNDS = int(os.environ.get("PT_AB_ROUNDS", "3"))
SPP = int(os.environ.get("PT_AB_SPP", "256"))
SIZE = int(os.environ.get("PT_AB_SIZE", "1024" if KERNEL == "simple"
                          else "512"))


def make_fn():
    """Returns (module, attr, fn(key) -> film) closing over baked args;
    fn re-reads the patched module constant at trace time."""
    if KERNEL == "simple":
        from opencl_montecarlo_path_tracing_tpu.ops import pallas_simple as K
        from opencl_montecarlo_path_tracing_tpu.scene.scene import (
            simple_scene)
        scn = prep_scene(simple_scene())
        return K, "_SPP_GROUP", lambda k: K.film_simple_mega(
            k, scn, SIZE, SIZE, SPP)
    from opencl_montecarlo_path_tracing_tpu.ops import pallas_bpt as K
    from opencl_montecarlo_path_tracing_tpu.ops import vlp as vlpmod
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene
    scn = prep_scene(demo_scene()[0])

    def fn(k):
        vlps = vlpmod.emit_vlps(k, scn, 512)
        return K.film_vlp_mega(k, scn, vlps, SIZE, SIZE, SPP)

    return K, "_VLP_SPP_GROUP", fn


def main():
    K, attr, fn = make_fn()
    paths = SIZE * SIZE * SPP
    key = make_key(5)
    films, fns = {}, {}
    g_orig = getattr(K, attr)
    try:
        for g in GROUPS:
            setattr(K, attr, g)
            # fresh function OBJECT per G: JAX's tracing cache keys on
            # the callable identity, so re-jitting the same fn would
            # silently reuse the first G's trace (measured: identical
            # programs, flat timings)
            jfn = jax.jit(lambda k, _g=g: fn(k))
            t0 = time.perf_counter()
            films[g] = np.asarray(jfn(key))
            print(f"G={g}: compile+first {time.perf_counter() - t0:.0f}s "
                  f"mean {films[g].mean():.4f}", flush=True)
            fns[g] = jfn
    finally:
        setattr(K, attr, g_orig)
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
