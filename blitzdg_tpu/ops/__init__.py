from .advec1d import advec1d_rhs
from .burgers1d import burgers1d_rhs, burgers_exact

__all__ = ["advec1d_rhs", "burgers1d_rhs", "burgers_exact"]
