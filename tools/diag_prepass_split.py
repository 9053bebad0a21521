"""Cost split of the blocked/stream megakernel: prepass vs block scans
(r4 VERDICT #1 scoping measurement).

The take-list/flag prepass re-runs per spp group per trace; VERDICT r4
asks whether amortizing it across the spp loop (fixed camera, ~invariant
primary frusta) can buy >= 1.3x at 262k/1M.  Before building that, this
tool measures what fraction of the frame the prepass actually is, with
the _DIAG_SPLIT knob (ops/pallas_super.py):

    full      the production kernel
    noscan    flag prepass + take-list build run, taken-block scans
              skipped (film WRONG - timing only)
    noblocks  whole blocked stage skipped (= fixed work: RNG, camera,
              floor/sphere/square scans, shading)

    prepass share  = (noscan - noblocks) / full
    scan share     = (full - noscan) / full

An spp-loop amortization of the PRIMARY prepass can save at most
~(primary prepass)*(G_frames-1)/G_frames of the frame; the shadow-union
prepasses re-derive from the running occlusion mask and cannot be
hoisted.  Interleaved in one session, amortized over FRAMES in-jit
frames (the per-call tunnel overhead would otherwise dominate).

Run on TPU: PYTHONPATH=/root/repo python tools/diag_prepass_split.py
Env: PT_DIAG_SCENES=20k,262k[,1M] PT_DIAG_SIZE=512 PT_DIAG_SPP=4
     PT_DIAG_FRAMES=8 PT_DIAG_ROUNDS=3
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.ops import pallas_super as M
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
    demo_scene, ripple_sheet_mesh)
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene

SIZE = int(os.environ.get("PT_DIAG_SIZE", "512"))
SPP = int(os.environ.get("PT_DIAG_SPP", "4"))
FRAMES = int(os.environ.get("PT_DIAG_FRAMES", "8"))
ROUNDS = int(os.environ.get("PT_DIAG_ROUNDS", "3"))

SHEETS = {"20k": (144, 72), "65k": (256, 128), "262k": (512, 256),
          "1M": (1024, 512)}


def scene_for(tag):
    base, _ = demo_scene()
    lights = base.lights
    if int(os.environ.get("PT_DIAG_NOLIGHTS", "0")):
        # 0-light variant isolates the PRIMARY trace: its prepass share
        # here bounds what an spp-loop/frame-level take-list hoist can
        # save (shadow prepasses re-derive from the occ carry)
        lights = np.zeros((0, 4), np.float32)
    return prep_scene(Scene(
        sphere_centers=base.sphere_centers, square_kj=base.square_kj,
        triangles=ripple_sheet_mesh(*SHEETS[tag]), lights=lights))


def make_fn(scn, mode):
    """Amortized FRAMES-frame render compiled UNDER the _DIAG_SPLIT
    patch (fresh closure per variant - the tracing cache keys on the
    callable)."""
    prev = M._DIAG_SPLIT
    M._DIAG_SPLIT = mode
    try:
        def many(key, s=scn):
            def body(i, acc):
                k = (key[0] + i.astype(jnp.uint32), key[1])
                return acc + M.film_super_mega(k, s, SIZE, SIZE, SPP)
            return jax.lax.fori_loop(
                0, FRAMES, body, jnp.zeros((SIZE, SIZE, 3), jnp.float32))
        fn = jax.jit(many)
        t0 = time.perf_counter()
        np.asarray(fn(make_key(9)))   # trace+compile under the patch
        first = time.perf_counter() - t0
    finally:
        M._DIAG_SPLIT = prev
    return fn, first


def main():
    scenes = os.environ.get("PT_DIAG_SCENES", "20k,262k").split(",")
    key = make_key(9)
    for tag in scenes:
        scn = scene_for(tag)
        nt = int(scn.tri_v0.shape[0])
        fns = {}
        for mode in ("", "noscan", "noblocks"):
            fns[mode], first = make_fn(scn, mode)
            print(f"{tag} {mode or 'full':8s}: compile+first {first:.0f}s",
                  flush=True)
        best = {m: float("inf") for m in fns}
        for r in range(ROUNDS):
            for m, fn in fns.items():   # interleaved
                t0 = time.perf_counter()
                np.asarray(fn(key))
                best[m] = min(best[m], time.perf_counter() - t0)
        full, noscan, noblocks = best[""], best["noscan"], best["noblocks"]
        paths = SIZE * SIZE * SPP * FRAMES
        print(f"{tag} nt={nt}: full {full*1e3:.1f} ms "
              f"({paths/full/1e6:.2f} Mpaths/s), noscan {noscan*1e3:.1f}, "
              f"noblocks {noblocks*1e3:.1f}", flush=True)
        print(f"  -> prepass {(noscan-noblocks)/full*100:.1f}% | "
              f"block scans {(full-noscan)/full*100:.1f}% | "
              f"fixed {noblocks/full*100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
