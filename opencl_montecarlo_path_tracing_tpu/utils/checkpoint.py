"""Film checkpoint / resume.

The reference has no checkpointing (SURVEY.md section 5: "closest analog:
committed result images").  The rebuild gets it for free from the
counter-based RNG: a render is a sum of disjoint spp windows
(render(spp_offset, spp) composes exactly - tested in
tests/test_render_simple.py::test_spp_window_composition), so a film can be
saved mid-accumulation and resumed later, on a different host or device
layout, with bit-identical sample content.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class FilmCheckpoint:
    film: np.ndarray          # pre-ambient float32 (H, W, 3) accumulated so far
    spp_done: int             # samples accumulated
    spp_total: int            # logical total (fixes the RNG stream space)
    seed: int
    meta: dict

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, film=self.film, spp_done=self.spp_done,
            spp_total=self.spp_total, seed=self.seed,
            meta_keys=np.array(list(self.meta.keys()), dtype=object),
            meta_vals=np.array([str(v) for v in self.meta.values()],
                               dtype=object))

    @staticmethod
    def load(path: str) -> "FilmCheckpoint":
        z = np.load(path, allow_pickle=True)
        meta = dict(zip(z["meta_keys"].tolist(), z["meta_vals"].tolist()))
        return FilmCheckpoint(film=z["film"], spp_done=int(z["spp_done"]),
                              spp_total=int(z["spp_total"]),
                              seed=int(z["seed"]), meta=meta)


def render_resumable(render_fn, key, scene, width, height, spp_total,
                     checkpoint_path: str | None = None,
                     spp_per_step: int = 64, seed: int = 0, **kw):
    """Accumulate ``spp_total`` samples in windows of ``spp_per_step``,
    checkpointing after each window.  ``render_fn`` must accept
    (key, scene, width, height, spp=..., spp_offset=..., spp_total=...).

    Returns the completed FilmCheckpoint.
    """
    ck = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = FilmCheckpoint.load(checkpoint_path)
        if (ck.spp_total != spp_total or ck.seed != seed
                or ck.film.shape != (height, width, 3)):
            ck = None  # incompatible checkpoint: start over
    if ck is None:
        ck = FilmCheckpoint(film=np.zeros((height, width, 3), np.float32),
                            spp_done=0, spp_total=spp_total, seed=seed,
                            meta={"width": width, "height": height})

    while ck.spp_done < spp_total:
        step = min(spp_per_step, spp_total - ck.spp_done)
        film = render_fn(key, scene, width, height, spp=step,
                         spp_offset=ck.spp_done, spp_total=spp_total, **kw)
        ck.film = ck.film + np.asarray(film)
        ck.spp_done += step
        if checkpoint_path:
            ck.save(checkpoint_path)
    return ck
