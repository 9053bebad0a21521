from .simple import render_simple
from .super import render_super
from .sample_parallel import render_sample_parallel
from .trianglegrid import render_trianglegrid
from .bidirectional import render_bidirectional
from .metropolis import render_metropolis
from .oracle import render_oracle
from .oracle_super import render_oracle_super

__all__ = [
    "render_simple", "render_super", "render_sample_parallel",
    "render_trianglegrid", "render_bidirectional", "render_metropolis",
    "render_oracle", "render_oracle_super",
]
