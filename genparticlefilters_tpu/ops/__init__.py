"""Pallas TPU kernels for the hot SMC ops (resampling gather; more to come)."""

from . import gather as _gather

from .gather import *  # noqa: F401,F403

__all__ = _gather.__all__
