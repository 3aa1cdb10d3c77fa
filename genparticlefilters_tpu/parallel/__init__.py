"""Parallel layer: device meshes, sharded particle states, shard-local
resampling, and cross-shard exchange (SURVEY.md §2 parallelism strategies &
§5 distributed-communication design)."""

from . import mesh as _mesh
from . import distributed as _distributed

from .mesh import *  # noqa: F401,F403
from .distributed import *  # noqa: F401,F403

__all__ = _mesh.__all__ + _distributed.__all__
