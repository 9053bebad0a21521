"""Estimator regression guard: every integrator must reproduce its stored
fixture summary (tools/make_regression_films.py) within a loose tolerance.

A genuine estimator change (shading constants, RNG keying, illumination
order) shifts the 16x16 block-mean summary of the full 512^2 view by far
more than the tolerance; pure numeric refactors (op reordering, fusion
changes) stay well inside it.  Regenerate fixtures deliberately when an
intentional change lands.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "films.npz")


@pytest.fixture(scope="module")
def rendered():
    if not os.path.exists(FIXTURE):
        pytest.skip("fixtures not generated")
    import tools.make_regression_films as gen
    return gen.render_all()


@pytest.fixture(scope="module")
def films():
    return np.load(FIXTURE)


@pytest.mark.parametrize("name", ["simple", "super", "trianglegrid",
                                  "bidirectional", "metropolis",
                                  "metropolis_vlpgrid", "nodof"])
def test_film_matches_fixture(name, rendered, films):
    got = rendered[name]
    want = films[name]
    assert got.shape == want.shape
    np.testing.assert_allclose(
        got, want, rtol=2e-3, atol=2e-3,
        err_msg=f"{name} film drifted from its fixture - estimator change? "
                "If intentional, regenerate with "
                "tools/make_regression_films.py")


def test_fixtures_distinguish_estimators(films):
    """Sanity: the summaries actually differ across integrators (i.e. the
    fixtures exercise scene content, not just the sky)."""
    a = films["super"]
    for other in ("bidirectional", "metropolis"):
        assert np.abs(films[other] - a).max() > 0.01, other
