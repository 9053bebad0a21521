import numpy as np
import jax.numpy as jnp

from opencl_montecarlo_path_tracing_tpu.core import rng as R


def test_threefry_known_answers():
    # Random123 KAT vectors for threefry2x32, 20 rounds
    y0, y1 = R.threefry2x32(np.uint32(0), np.uint32(0),
                            np.uint32(0), np.uint32(0))
    assert (int(y0), int(y1)) == (0x6B200159, 0x99BA4EFE)

    y0, y1 = R.threefry2x32(np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF),
                            np.uint32(0xFFFFFFFF), np.uint32(0xFFFFFFFF))
    assert (int(y0), int(y1)) == (0x1CB996FC, 0xBB002BE7)

    y0, y1 = R.threefry2x32(np.uint32(0x13198A2E), np.uint32(0x03707344),
                            np.uint32(0x243F6A88), np.uint32(0x85A308D3))
    assert (int(y0), int(y1)) == (0xC4923A9C, 0x483DF7A0)


def test_uniformity():
    key = R.make_key(1234)
    ids = jnp.arange(1 << 16, dtype=jnp.uint32)
    u, v = R.rand2(key, ids, 0)
    u = np.asarray(u)
    v = np.asarray(v)
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(v.mean() - 0.5) < 0.005
    assert abs(np.corrcoef(u, v)[0, 1]) < 0.02
    # neighbouring sites decorrelated
    u2, _ = R.rand2(key, ids, 1)
    assert abs(np.corrcoef(u, np.asarray(u2))[0, 1]) < 0.02


def test_layout_invariance():
    """Draws depend only on (key, ray_id, site) - not on array layout."""
    key = R.make_key(7)
    ids = jnp.arange(4096, dtype=jnp.uint32)
    a, _ = R.rand2(key, ids, 3)
    b, _ = R.rand2(key, ids.reshape(64, 64), 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b).reshape(-1))
    # chunked evaluation identical
    c1, _ = R.rand2(key, ids[:2048], 3)
    c2, _ = R.rand2(key, ids[2048:], 3)
    np.testing.assert_array_equal(np.asarray(a),
                                  np.concatenate([np.asarray(c1), np.asarray(c2)]))


def test_sites_do_not_collide():
    key = R.make_key(7)
    ids = jnp.arange(128, dtype=jnp.uint32)
    draws = R.randn_draws(key, ids, 5, 16)
    flat = np.stack([np.asarray(d) for d in draws])
    assert np.unique(flat.round(7)).size > 0.99 * flat.size
    # site 6 must not reproduce any of site 5's blocks
    d6 = R.randn_draws(key, ids, 6, 2)
    assert not np.allclose(np.asarray(d6[0]), np.asarray(draws[0]))


def test_numpy_twin_known_answers_and_equality():
    """The pure-NumPy threefry twin (used by the oracles' common-random-
    numbers mode) passes the same Random123 KATs and matches the jnp
    implementation bit-for-bit on bulk counters."""
    y0, y1 = R.threefry2x32_np(np.uint32(0), np.uint32(0),
                               np.uint32(0), np.uint32(0))
    assert (int(y0), int(y1)) == (0x6B200159, 0x99BA4EFE)
    y0, y1 = R.threefry2x32_np(np.uint32(0x13198A2E), np.uint32(0x03707344),
                               np.uint32(0x243F6A88), np.uint32(0x85A308D3))
    assert (int(y0), int(y1)) == (0xC4923A9C, 0x483DF7A0)

    key = R.make_key(0xDEADBEEFCAFE)
    ids = np.arange(1 << 12, dtype=np.uint32) * np.uint32(2654435761)
    for site in (0, 3, 65, 0xFFFFFFFF):
        a0, a1 = R.rand2(key, jnp.asarray(ids), site)
        b0, b1 = R.rand2_np(key, ids, site)
        np.testing.assert_array_equal(np.asarray(a0), b0)
        np.testing.assert_array_equal(np.asarray(a1), b1)
    a = R.randn_draws(key, jnp.asarray(ids), 7, 5)
    b = R.randn_draws_np(key, ids, 7, 5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), y)
