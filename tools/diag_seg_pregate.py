"""Segmented BLOCKED scans revisited with the round-5 segment pre-gate.

Round 3 measured 128-block segments ~10% net SLOWER at 20k/65k: each
extra segment cost ~2 flag-DMA waits per trace while the near-to-far
t/occ re-prune saved only ~2 taken blocks/tile - so _SEG=1024 keeps
every <= 131k-triangle mesh in ONE segment, even though a host sim said
~45% of primary block scans become prunable once the near surface's t
is known.  The round-5 SEGMENT PRE-GATE removes the fixed per-segment
cost for segments a trace's bundles cannot touch, which may flip that
trade: this tool interleaves _SEG in {1024, 256, 128, 64} on the 20k
and 65k visible ripple sheets (amortized in-jit frames, fresh jit
closure per patched constant - the tracing cache keys on the callable)
and checks the films agree.

Run on TPU: PYTHONPATH=/root/repo python tools/diag_seg_pregate.py
Env: PT_DIAG_SCENES=20k,65k PT_DIAG_SEGS=1024,256,128,64
     PT_DIAG_SIZE=512 PT_DIAG_SPP=4 PT_DIAG_FRAMES=8 PT_DIAG_ROUNDS=3
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
SEGS = [int(v) for v in
        os.environ.get("PT_DIAG_SEGS", "1024,256,128,64").split(",")]

SHEETS = {"20k": (144, 72), "65k": (256, 128)}


def main():
    scenes = os.environ.get("PT_DIAG_SCENES", "20k,65k").split(",")
    key = make_key(9)
    base, _ = demo_scene()
    for tag in scenes:
        scn = prep_scene(Scene(
            sphere_centers=base.sphere_centers, square_kj=base.square_kj,
            triangles=ripple_sheet_mesh(*SHEETS[tag]), lights=base.lights))
        nt = int(scn.tri_v0.shape[0])
        nb = -(-(-(-nt // M._TRI_BLOCK) // M._MACRO) * M._MACRO)
        fns, films = {}, {}
        for seg in SEGS:
            prev = M._SEG
            M._SEG = seg
            try:
                def many(key, s=scn):
                    def body(i, acc):
                        k = (key[0] + i.astype(jnp.uint32), key[1])
                        return acc + M.film_super_mega(k, s, SIZE, SIZE,
                                                       SPP)
                    return jax.lax.fori_loop(
                        0, FRAMES, body,
                        jnp.zeros((SIZE, SIZE, 3), jnp.float32))
                fn = jax.jit(many)
                t0 = time.perf_counter()
                films[seg] = np.asarray(fn(key))
                first = time.perf_counter() - t0
            finally:
                M._SEG = prev
            fns[seg] = fn
            n_seg = -(-abs(nb) // seg)
            print(f"{tag} _SEG={seg} ({n_seg} seg): compile+first "
                  f"{first:.0f}s mean {films[seg].mean():.6f}", flush=True)
        ref = films[SEGS[0]]
        for seg in SEGS[1:]:
            d = np.abs(films[seg] - ref).max()
            print(f"{tag} _SEG={seg} vs {SEGS[0]}: max|diff| {d:.2e}",
                  flush=True)
        best = {s: float("inf") for s in SEGS}
        for r in range(ROUNDS):
            for seg, fn in fns.items():
                t0 = time.perf_counter()
                np.asarray(fn(key))
                best[seg] = min(best[seg], time.perf_counter() - t0)
        paths = SIZE * SIZE * SPP * FRAMES
        for seg in SEGS:
            print(f"{tag} _SEG={seg}: {best[seg]*1e3:8.1f} ms "
                  f"({paths/best[seg]/1e6:6.2f} Mpaths/s)", flush=True)


if __name__ == "__main__":
    main()
