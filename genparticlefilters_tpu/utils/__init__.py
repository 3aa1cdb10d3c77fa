"""Utility layer: weight math, stratification, PRNG discipline."""

from .weights import *  # noqa: F401,F403
from .stratification import *  # noqa: F401,F403
