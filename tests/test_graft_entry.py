"""The driver entry points must work on the virtual CPU mesh."""

import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_2():
    graft.dryrun_multichip(2)


def test_dryrun_multichip_6_falls_back_to_1d():
    # 6 devices: rows (3) would not divide the 16-row dry-run image, so the
    # 2-D mesh must not be chosen
    graft.dryrun_multichip(6)


def test_dryrun_multichip_4_uses_2d():
    graft.dryrun_multichip(4)
