"""Metropolis chain vs the independent per-chain NumPy oracle.

models/oracle_mlt.py transcribes GetRandomPath/Mutate/Perturbation/
VerifyIntersection + emission (metropolispathtracer.ocl:146-283,431-530,
with the three documented repairs) one chain at a time with Python control
flow; models/metropolis.py is fully batched jnp.  Both draw from the same
threefry (key, chain, site) streams, so the emitted VLP tables must agree
ELEMENTWISE - every mutation decision, perturbation, verification trace and
emission is checked.

The reference scene's emission is sparse (lamb = dot(dir, normal) <= 0 for
front-facing hits - faithful to ocl:254), so the dense tests use a scene
with the light BELOW the floor (floor normal (0,0,1), upward rays give
lamb = dz > 0) plus spheres under it for multi-vertex paths.
"""

import numpy as np

from opencl_montecarlo_path_tracing_tpu.core.rng import make_key
from opencl_montecarlo_path_tracing_tpu.models.metropolis import (
    mlt_vlps, render_metropolis)
from opencl_montecarlo_path_tracing_tpu.models.oracle_mlt import (
    mlt_vlps_oracle, render_oracle_mlt)
from opencl_montecarlo_path_tracing_tpu.ops.intersect import prep_scene
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene
from tests.test_render_super import small_scene


def underlight_scene():
    return Scene(
        sphere_centers=np.array([[2, 0, -5], [-2, 1, -5]], np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=np.zeros((0, 3, 3), np.float32),
        lights=np.array([[0, 0, -5, 100]], np.float32))


def chain_match(jv, ov, n_chains, atol=1e-4):
    """Fraction of chains whose full VLP rows (all lights x depths) agree.

    A VerifyIntersection decision compares a re-trace distance against
    verify_eps; the distance is a CONTINUOUS function of the perturbation,
    so two float implementations (XLA with fma vs NumPy) occasionally flip
    a borderline verify and that chain's history diverges - inherent to the
    chaotic chain, not an implementation defect.  The contract is therefore:
    non-flipped chains match elementwise, flips are rare."""
    jc = jv.reshape(-1, n_chains, 4)
    oc = ov.reshape(-1, n_chains, 4)
    ok = (np.abs(jc - oc) <= atol + 1e-4 * np.abs(oc)).all(axis=(0, 2))
    return ok.mean()


def test_mlt_vlps_match_oracle_dense():
    scene = underlight_scene()
    key = make_key(41)
    jv = np.asarray(mlt_vlps(key, prep_scene(scene), 64, 4))
    ov = mlt_vlps_oracle(scene, key, 64, 4)
    assert jv.shape == ov.shape == (256, 4)
    emitted = (jv[:, 3] > 0).sum()
    assert emitted >= 20, f"test scene must emit densely, got {emitted}"
    assert chain_match(jv, ov, 64) >= 0.9


def test_mlt_vlps_match_oracle_reference_scene():
    """On the real scene too (sparse emission, deep mutation history)."""
    scene = small_scene()
    key = make_key(123)
    jv = np.asarray(mlt_vlps(key, prep_scene(scene), 128, 4))
    ov = mlt_vlps_oracle(scene, key, 128, 4)
    assert chain_match(jv, ov, 128) >= 0.9


def test_mlt_film_matches_oracle_crn():
    """End-to-end: chains + gather + camera under common random numbers,
    on a floor band (rows 372+) so the render pass sees geometry.  The
    gather term with guaranteed-live VLPs is additionally pinned by
    tests/test_crn.py::test_bidirectional_gather_crn_live_vlps (the MLT
    render pass shares that code)."""
    scene = underlight_scene()
    key = make_key(42)
    spp = 2
    rows, r0 = 8, 372
    jx = np.asarray(render_metropolis(key, scene, 24, r0 + rows, spp=spp,
                                      n_seedpaths=32,
                                      mutation_rounds=2))[r0:]
    orc = render_oracle_mlt(scene, 24, rows, spp=spp, n_seedpaths=32,
                            mutation_rounds=2, key=key, row_offset=r0)
    d = np.abs(jx - orc) / spp * 64.0 / 255.0
    assert float(d.max()) < 1e-5, float(d.max())


def test_mlt_statistics_independent_streams():
    """Chain STATISTICS agree across different random streams: the oracle on
    key B reproduces the JAX chain's emission rate and intensity moments on
    key A (so the elementwise matches above are not an artifact of shared
    streams)."""
    scene = underlight_scene()
    jv = np.asarray(mlt_vlps(make_key(1000), prep_scene(scene), 96, 6))
    ov = mlt_vlps_oracle(scene, make_key(2000), 96, 6)
    je, oe = jv[:, 3] > 0, ov[:, 3] > 0
    # emission rate within 25% relative
    assert abs(je.mean() - oe.mean()) < 0.25 * max(je.mean(), oe.mean())
    # mean emitted intensity within 25% relative
    ji, oi = jv[je, 3].mean(), ov[oe, 3].mean()
    assert abs(ji - oi) < 0.25 * max(ji, oi), (ji, oi)
    # emitted positions live on the same geometry (floor plane z ~ 0 or the
    # sphere shells): mean |z| small for floor-dominated emission
    assert abs(np.median(jv[je, 2]) - np.median(ov[oe, 2])) < 0.5
