"""The MXU matmul formulation of Moller-Trumbore must agree with the
scalar-scan formulation (the reference semantics oracle)."""

import numpy as np
import jax.numpy as jnp

from opencl_montecarlo_path_tracing_tpu.core.quirks import Quirks, DEFAULT
from opencl_montecarlo_path_tracing_tpu.ops import intersect as I
from opencl_montecarlo_path_tracing_tpu.scene.builtin import torus_mesh
from opencl_montecarlo_path_tracing_tpu.scene.scene import Scene


def _scene(n_major=8, n_minor=6):
    return I.prep_scene(Scene(
        sphere_centers=np.zeros((0, 3), np.float32),
        square_kj=np.zeros((0, 2), np.float32),
        triangles=torus_mesh(n_major=n_major, n_minor=n_minor),
        lights=np.zeros((0, 4), np.float32),
    ))


def _rays(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal([7.8, 5.0, 10.7], 3.0, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_mxu_matches_scan_closest_hit():
    scn = _scene()
    o, d = _rays()
    for quirks in (DEFAULT, Quirks.reference()):
        # force the Pallas MXU path by dropping the threshold
        orig = I._MXU_MIN_TRIANGLES
        I._MXU_MIN_TRIANGLES = 1
        try:
            mxu = I.trace_ray(o, d, scn, quirks=quirks)
        finally:
            I._MXU_MIN_TRIANGLES = orig
        scan = I.trace_ray(o, d, scn, quirks=quirks)
        hit = np.asarray(scan.material) != 0
        assert hit.any()
        np.testing.assert_array_equal(np.asarray(mxu.material),
                                      np.asarray(scan.material))
        np.testing.assert_allclose(np.asarray(mxu.t)[hit],
                                   np.asarray(scan.t)[hit],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(mxu.normal)[hit],
                                   np.asarray(scan.normal)[hit],
                                   rtol=1e-4, atol=1e-4)


def test_mxu_matches_scan_any_hit():
    scn = _scene()
    o, d = _rays(seed=3)
    for tl in (np.float32(1e9), jnp.full(o.shape[0], 2.5, jnp.float32)):
        orig = I._MXU_MIN_TRIANGLES
        I._MXU_MIN_TRIANGLES = 1
        try:
            mxu = I.any_hit(o, d, scn, t_limit=tl)
        finally:
            I._MXU_MIN_TRIANGLES = orig
        scan = I.any_hit(o, d, scn, t_limit=tl)
        agree = np.asarray(mxu) == np.asarray(scan)
        # float rounding at the validity boundaries may flip isolated rays
        assert agree.mean() > 0.999, agree.mean()


def test_weights_reproduce_quads_directly():
    """Spot-check the algebra: det/u/v/t from the weight matmul equal the
    classic per-pair cross/dot formulation."""
    scn = _scene(4, 3)
    o, d = _rays(256, seed=5)
    on = np.asarray(o)
    dn = np.asarray(d)
    det, un, vn, tn = I._mxu_quads(o[:, 0], o[:, 1], o[:, 2],
                                   d[:, 0], d[:, 1], d[:, 2], scn)
    v0, e0, e2 = scn.tri_v0, scn.tri_e0, scn.tri_e2
    for ti in range(v0.shape[0]):
        pvec = np.cross(dn, e2[ti])
        det_ref = (pvec * e0[ti]).sum(-1)
        tvec = on - v0[ti]
        un_ref = (tvec * pvec).sum(-1)
        qvec = np.cross(tvec, e0[ti])
        vn_ref = (dn * qvec).sum(-1)
        tn_ref = (e2[ti] * qvec).sum(-1)
        np.testing.assert_allclose(np.asarray(det)[:, ti], det_ref,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(un)[:, ti], un_ref,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(vn)[:, ti], vn_ref,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(tn)[:, ti], tn_ref,
                                   rtol=1e-3, atol=1e-3)
