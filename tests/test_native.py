"""Native C++ runtime (PAM IO + scene parsers) vs the Python oracle."""

import os
import subprocess

import numpy as np
import pytest

from opencl_montecarlo_path_tracing_tpu.utils import native, pam
from opencl_montecarlo_path_tracing_tpu.scene import formats
from tests.conftest import REFERENCE_DIR, reference_available


@pytest.fixture(scope="module")
def lib():
    got = native.load(build=True)
    if got is None:
        pytest.skip("native toolchain unavailable")
    return got


def test_builds(lib):
    assert lib is not None


def test_pam_roundtrip_native(lib, tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, size=(10, 6, 4), dtype=np.uint8)
    f = str(tmp_path / "n.ppm")
    assert native.pam_write(f, 6, 10, 4, 255, 8, data)
    w, h, ch, mv, back = native.pam_read(f)
    assert (w, h, ch, mv) == (6, 10, 4, 255)
    np.testing.assert_array_equal(back.reshape(10, 6, 4), data)


def test_native_write_matches_python_bytes(lib, tmp_path):
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    img = pam.ImgInfo(width=8, height=8, channels=4, data=data)
    f_native = str(tmp_path / "a.ppm")
    f_python = str(tmp_path / "b.ppm")
    env_backup = os.environ.get("PT_NO_NATIVE")
    pam.save_pam(f_native, img)
    os.environ["PT_NO_NATIVE"] = "1"
    try:
        pam.save_pam(f_python, img)
    finally:
        if env_backup is None:
            os.environ.pop("PT_NO_NATIVE", None)
        else:
            os.environ["PT_NO_NATIVE"] = env_backup
    with open(f_native, "rb") as a, open(f_python, "rb") as b:
        assert a.read() == b.read()


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_native_parsers_match_python(lib):
    d = os.path.join(REFERENCE_DIR, "CLSuperPathTracer")
    env_key = "PT_NO_NATIVE"
    for name in ("spheres.txt", "squares.txt"):
        nat = native.parse_bitmap(os.path.join(d, name))
        os.environ[env_key] = "1"
        try:
            py = formats.parse_array_file(os.path.join(d, name))
        finally:
            os.environ.pop(env_key, None)
        np.testing.assert_array_equal(nat, py)

    nat_t = native.parse_triangles(os.path.join(d, "triangles.txt"), 65536)
    nat_l = native.parse_lights(os.path.join(d, "lights.txt"), 5)
    os.environ[env_key] = "1"
    try:
        py_t = formats.parse_triangles_file(os.path.join(d, "triangles.txt"))
        py_l = formats.parse_lights_file(os.path.join(d, "lights.txt"))
    finally:
        os.environ.pop(env_key, None)
    np.testing.assert_array_equal(nat_t, py_t)
    np.testing.assert_array_equal(nat_l, py_l)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_native_reads_reference_golden(lib):
    golden = os.path.join(REFERENCE_DIR, "CLSuperPathTracer", "result.ppm")
    w, h, ch, mv, data = native.pam_read(golden)
    assert (w, h, ch, mv) == (512, 512, 4, 255)
    assert data.reshape(512, 512, 4)[..., 3].min() == 255
