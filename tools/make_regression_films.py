"""Generate the estimator-regression fixtures (tests/fixtures/films.npz).

The reference camera CROPS rather than rescales when the image is small
(pixel coords enter the direction directly, pathtracer.ocl:236), so tiny
renders only see a sky corner.  Fixtures therefore render the full 512^2
view at 1 spp and store a 16x16 block-averaged summary - small on disk but
sensitive to any estimator change (shading constants, RNG keying,
illumination order all shift the summary by far more than the tolerance).

Regenerate deliberately with this script when an intentional estimator
change lands, and say so in the commit message.  Runs on the forced-CPU
backend so fixtures are hardware-independent:

    python tools/make_regression_films.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "films.npz")


def summarize(film):
    """(512, 512, 3) -> (16, 16, 3) block means."""
    f = np.asarray(film, np.float32)
    return f.reshape(16, 32, 16, 32, 3).mean(axis=(1, 3))


def render_all():
    import opencl_montecarlo_path_tracing_tpu as pt
    from opencl_montecarlo_path_tracing_tpu.scene.builtin import (
        procedural_super_scene)

    scene = procedural_super_scene()
    w = h = 512
    films = {}
    films["simple"] = summarize(pt.render("simple", None, w, h, spp=1,
                                          seed=11))
    films["super"] = summarize(pt.render("super", scene, w, h, spp=1,
                                         seed=11))
    films["trianglegrid"] = summarize(pt.render("trianglegrid", scene, w, h,
                                                spp=1, seed=11))
    films["bidirectional"] = summarize(pt.render("bidirectional", scene, w, h,
                                                 spp=1, seed=11, n_vlp=64))
    films["metropolis"] = summarize(pt.render("metropolis", scene, w, h,
                                              spp=1, seed=11, n_seedpaths=32,
                                              mutation_rounds=2))
    films["metropolis_vlpgrid"] = summarize(pt.render(
        "metropolis_vlpgrid", scene, w, h, spp=1, seed=11,
        n_seedpaths=32, mutation_rounds=2))
    films["nodof"] = summarize(pt.render("nodof", scene, w, h, spp=4,
                                         seed=11)[..., :3].astype(np.float32))
    return films


def main():
    films = render_all()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **films)
    for k, v in films.items():
        print(f"{k}: mean {v.mean():.4f} max {v.max():.2f}")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
