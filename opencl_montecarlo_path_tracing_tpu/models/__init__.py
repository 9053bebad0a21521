from .simple import render_simple
from .super import render_super

__all__ = ["render_simple", "render_super"]
