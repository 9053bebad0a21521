"""Unified rendering entry point.

``render(variant, ...)`` dispatches to the integrator family with one
call signature - the single-import surface for users switching from the
reference's eight binaries.
"""

from __future__ import annotations

import numpy as np

from .core.rng import make_key
from .core.quirks import Quirks, DEFAULT
from .scene.scene import Scene
from .utils.pam import film_to_rgba8

VARIANTS = ("simplecpu", "simple", "super", "superlmem", "nodof",
            "trianglegrid", "bidirectional", "metropolis",
            "metropolis_vlpgrid")


def render(variant: str, scene: Scene | None = None, width: int = 512,
           height: int = 512, spp: int = 64, seed: int = 0,
           quirks: Quirks = DEFAULT, as_rgba8: bool = False, **kw):
    """Render with any integrator.

    Extra options by variant: trianglegrid: cell_size_modifier;
    bidirectional: n_vlp, use_grid; metropolis*: n_seedpaths,
    mutation_rounds, grid_modifier, verify_eps.

    Returns the pre-ambient float film (H, W, 3), or the final RGBA8 image
    when ``as_rgba8`` (the nodof variant always quantises on device).
    """
    key = make_key(seed)
    if variant == "simplecpu":
        from .models.oracle import render_oracle
        film = render_oracle(width, height, spp=spp, seed=seed, **kw)
    elif variant == "simple":
        from .models.simple import render_simple
        film = render_simple(key, width, height, spp=spp, quirks=quirks, **kw)
    elif variant in ("super", "superlmem"):
        from .models.super import render_super
        film = render_super(key, scene, width, height, spp=spp,
                            quirks=quirks, **kw)
    elif variant == "nodof":
        from .models.sample_parallel import render_sample_parallel
        sg = int(round(np.sqrt(spp)))
        if sg * sg != spp:
            raise ValueError("nodof needs a square spp (sample grid)")
        return np.asarray(render_sample_parallel(key, scene, width, height,
                                                 sample_grid=sg,
                                                 quirks=quirks, **kw))
    elif variant == "trianglegrid":
        from .models.trianglegrid import render_trianglegrid
        film = render_trianglegrid(key, scene, width, height, spp=spp,
                                   quirks=quirks, **kw)
    elif variant == "bidirectional":
        from .models.bidirectional import render_bidirectional
        film = render_bidirectional(key, scene, width, height, spp=spp,
                                    quirks=quirks, **kw)
    elif variant in ("metropolis", "metropolis_vlpgrid"):
        from .models.metropolis import render_metropolis
        if variant.endswith("vlpgrid"):
            kw.setdefault("use_grid", True)
        film = render_metropolis(key, scene, width, height, spp=spp,
                                 quirks=quirks, **kw)
    else:
        raise ValueError(f"unknown variant {variant!r}; one of {VARIANTS}")
    if as_rgba8:
        return film_to_rgba8(np.asarray(film), wrap=quirks.wrap_uint8)
    return film
