"""Model library: the reference's example/benchmark model families rebuilt
TPU-native (BASELINE.md configs)."""

from .object_motion import *  # noqa: F401,F403
