"""Property-based tests (hypothesis) for the scene text parsers.

The reference parsers are fgets + atof/atoi token machines
(CLSuperPathTracer.c:62-139) that silently coerce garbage to zero; these
tests pin the rebuild's two independent implementations - pure Python
(scene/formats.py) and native C++ (native/pamscene.cpp) - against each
other on adversarial inputs, and pin structured-file round trips.
"""

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from opencl_montecarlo_path_tracing_tpu.scene import formats
from opencl_montecarlo_path_tracing_tpu.utils import native


def _native_available():
    return native.load() is not None


# numeric-junk alphabet: the decimal forms the reference's atof/atoi
# branch on, plus whitespace and stray punctuation.  Hex floats ("0x1A",
# which C strtod parses and Python float() rejects) are a documented
# non-goal - the reference's scene files are decimal (formats._atof).
_JUNK = st.text(alphabet="0123456789+-.eE \t,;#", max_size=30)


def _write(tmpdir, name, text):
    path = os.path.join(tmpdir, name)
    with open(path, "w") as fp:
        fp.write(text)
    return path


def _both(parse, path, *args):
    """Parse with the pure-Python and the native implementation."""
    old = os.environ.get("PT_NO_NATIVE")
    os.environ["PT_NO_NATIVE"] = "1"
    try:
        py = parse(path, *args)
    finally:
        if old is None:
            os.environ.pop("PT_NO_NATIVE", None)
        else:
            os.environ["PT_NO_NATIVE"] = old
    nat = parse(path, *args)
    return py, nat


def _model_atoi(s):
    """Independent strtoll model: leading [+-]digits, else 0; saturates
    at the int64 range (ERANGE -> LLONG_MAX / LLONG_MIN)."""
    s = s.strip()
    i = 1 if s[:1] in "+-" else 0
    j = i
    while j < len(s) and s[j].isdigit():
        j += 1
    v = int(s[:j]) if j > i else 0
    return max(-(2 ** 63), min(2 ** 63 - 1, v))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2 ** 19 - 1), min_size=0, max_size=12),
       _JUNK)
def test_bitmap_ints_and_junk(tmp_path_factory, ints, junk):
    """The first 9 lines land in the bitmap via strtoll (missing lines
    are zero); extra lines and numeric junk never crash; native ==
    Python."""
    tmpdir = str(tmp_path_factory.mktemp("bitmap"))
    lines = [str(i) for i in ints] + [junk]
    path = _write(tmpdir, "spheres.txt", "\n".join(lines))
    py, nat = _both(formats.parse_array_file, path)
    expect = np.zeros(9, np.int64)
    for i, ln in enumerate(lines[:9]):
        expect[i] = _model_atoi(ln)
    np.testing.assert_array_equal(py, expect)
    if _native_available():
        np.testing.assert_array_equal(nat, py)


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.floats(min_value=-1e6, max_value=1e6, width=32,
                       allow_nan=False, allow_infinity=False),
             min_size=9, max_size=9),
    min_size=0, max_size=8),
    st.booleans())
def test_triangles_roundtrip(tmp_path_factory, tris, drop_trailing):
    """n full 13-line frames parse to (n, 3, 3); the reference accepts a
    final frame with missing trailing separators (EOF mid-frame)."""
    tmpdir = str(tmp_path_factory.mktemp("tris"))
    lines = []
    for t in tris:
        for v in range(3):
            lines.extend(f"{np.float32(c):.9g}" for c in t[3 * v:3 * v + 3])
            lines.append("")
        lines.append("")
    text = "\n".join(lines)
    if drop_trailing:
        text = text.rstrip("\n")
    path = _write(tmpdir, "triangles.txt", text)
    py, nat = _both(formats.parse_triangles_file, path)
    expect = np.asarray(tris, np.float32).reshape(-1, 3, 3)
    np.testing.assert_array_equal(py, expect.reshape(py.shape))
    assert py.shape == (len(tris), 3, 3)
    if _native_available():
        np.testing.assert_array_equal(nat, py)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6, width=32,
                          allow_nan=False, allow_infinity=False),
                min_size=0, max_size=30))
def test_lights_quads_and_cap(tmp_path_factory, vals):
    """Lights parse in quads, capped at MAX_LIGHTS=5; an incomplete
    trailing quad is dropped (the reference's fgets loop needs 4 lines)."""
    tmpdir = str(tmp_path_factory.mktemp("lights"))
    path = _write(tmpdir, "lights.txt",
                  "\n".join(f"{np.float32(v):.9g}" for v in vals))
    py, nat = _both(formats.parse_lights_file, path)
    n = min(len(vals) // 4, formats.MAX_LIGHTS)
    expect = np.asarray(vals[:4 * n], np.float32).reshape(-1, 4)
    np.testing.assert_array_equal(py, expect.reshape(py.shape))
    assert py.shape == (n, 4)
    if _native_available():
        np.testing.assert_array_equal(nat, py)


@settings(max_examples=60, deadline=None)
@given(st.lists(_JUNK, min_size=0, max_size=26))
def test_parsers_never_crash_and_agree_on_junk(tmp_path_factory, lines):
    """Adversarial numeric junk: all three parsers return well-formed
    arrays and the native implementation matches Python exactly."""
    tmpdir = str(tmp_path_factory.mktemp("junk"))
    path = _write(tmpdir, "junk.txt", "\n".join(lines))
    for parse, checks in (
            (formats.parse_array_file, lambda a: a.shape == (9,)),
            (formats.parse_triangles_file,
             lambda a: a.ndim == 3 and a.shape[1:] == (3, 3)),
            (formats.parse_lights_file,
             lambda a: a.ndim == 2 and a.shape[1] == 4
             and a.shape[0] <= formats.MAX_LIGHTS)):
        py, nat = _both(parse, path)
        assert checks(py)
        if _native_available():
            np.testing.assert_array_equal(nat, py)


@pytest.mark.skipif(not _native_available(), reason="no native toolchain")
def test_native_is_actually_exercised():
    """Guard: the equivalence properties above are vacuous if the native
    library silently failed to build."""
    assert native.load() is not None
