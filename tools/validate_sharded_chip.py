"""Execute the sharded render path on the real TPU chip (VERDICT r2 #3).

The multi-chip story routes the Pallas megakernels inside shard_map with
traced spp/row offsets and a film psum (parallel/mesh.py); CPU tests take
the XLA branch, so this is the only place the composition runs on
hardware.  A 1-device mesh is degenerate but compiles and executes the
REAL sharded program (shard_map + axis_index-derived offsets + psum), and
its film must match the unsharded megakernel render exactly (offset 0,
local spp == total spp, 1-way psum).

Appends a results section suitable for VALIDATION.md.
"""

from __future__ import annotations

import numpy as np
import jax

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.models.super import render_super
from opencl_montecarlo_path_tracing_tpu.models.bidirectional import (
    render_bidirectional)
from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
    make_spp_mesh, render_super_sharded, render_bidirectional_sharded)
from opencl_montecarlo_path_tracing_tpu.scene.builtin import demo_scene


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    scene, tag = demo_scene()
    key = make_key(31)
    w = h = 512
    spp = 8
    mesh = make_spp_mesh(1)

    single = np.asarray(render_super(key, scene, w, h, spp=spp))
    sharded = np.asarray(render_super_sharded(key, scene, w, h, spp, mesh))
    d = np.abs(single - sharded)
    print(f"super sharded(mesh=1) vs unsharded on TPU: max|diff| "
          f"{d.max():.2e} (film mean {single.mean():.4f})", flush=True)
    assert d.max() <= 1e-5, d.max()

    single = np.asarray(render_bidirectional(key, scene, w, h, spp=spp,
                                             n_vlp=512))
    sharded = np.asarray(render_bidirectional_sharded(
        key, scene, w, h, spp, mesh, n_vlp=512))
    d = np.abs(single - sharded)
    print(f"bidirectional sharded(mesh=1) vs unsharded on TPU: max|diff| "
          f"{d.max():.2e} (film mean {single.mean():.4f})", flush=True)
    assert d.max() <= 1e-5, d.max()

    # sharded LIGHT PASS (r3 VERDICT #3): each device runs a chain window
    # of the Metropolis pipeline and the VLP table is all_gather-ed; a
    # 1-device mesh still runs the windowed emission + gather + reshape
    # program on hardware
    from opencl_montecarlo_path_tracing_tpu.models.metropolis import (
        render_metropolis)
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        render_metropolis_sharded)
    single = np.asarray(render_metropolis(key, scene, w, h, spp=spp,
                                          n_seedpaths=512,
                                          mutation_rounds=8))
    sharded = np.asarray(render_metropolis_sharded(
        key, scene, w, h, spp, mesh, n_seedpaths=512, mutation_rounds=8))
    d = np.abs(single - sharded)
    print(f"metropolis sharded-light-pass(mesh=1) vs unsharded on TPU: "
          f"max|diff| {d.max():.2e} (film mean {single.mean():.4f})",
          flush=True)
    assert d.max() <= 1e-5, d.max()

    # 2-D rows x spp sharding for the VLP integrators (round 4): light
    # pass sharded over the flattened device set, film psum('spp') +
    # row-gather('y'); a 1x1 mesh still runs the full composition
    from opencl_montecarlo_path_tracing_tpu.parallel.mesh import (
        make_mesh_2d, render_bidirectional_sharded_2d)
    mesh11 = make_mesh_2d(1, 1)
    single = np.asarray(render_bidirectional(key, scene, w, h, spp=spp,
                                             n_vlp=512))
    sharded = np.asarray(render_bidirectional_sharded_2d(
        key, scene, w, h, spp, mesh11, n_vlp=512))
    d = np.abs(single - sharded)
    print(f"bidirectional sharded-2d(mesh=1x1) vs unsharded on TPU: "
          f"max|diff| {d.max():.2e} (film mean {single.mean():.4f})",
          flush=True)
    assert d.max() <= 1e-5, d.max()

    # large-mesh: the BLOCKED megakernel (interval-gated take-list scan,
    # DMA scratch + SMEM take-lists) inside shard_map - a different
    # kernel instantiation than the SMEM-resident scan above
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
        large_mesh_scene)
    big = large_mesh_scene()
    spp_b = 4
    single = np.asarray(render_super(key, big, w, h, spp=spp_b))
    sharded = np.asarray(render_super_sharded(key, big, w, h, spp_b, mesh))
    d = np.abs(single - sharded)
    print(f"super sharded(mesh=1) BLOCKED 20k-tri vs unsharded: max|diff| "
          f"{d.max():.2e} (film mean {single.mean():.4f})", flush=True)
    assert d.max() <= 1e-5, d.max()
    print("sharded-on-chip validation OK", flush=True)


if __name__ == "__main__":
    main()
