"""Utility layer: weight math, stratification, checkpointing, profiling."""

from . import weights as _weights
from . import stratification as _stratification
from . import checkpoint as _checkpoint
from . import profiling as _profiling

from .weights import *  # noqa: F401,F403
from .stratification import *  # noqa: F401,F403
from .checkpoint import *  # noqa: F401,F403
from .profiling import *  # noqa: F401,F403

__all__ = (_weights.__all__ + _stratification.__all__
           + _checkpoint.__all__ + _profiling.__all__)
