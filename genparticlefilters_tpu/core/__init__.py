"""Core GFI substrate: distributions, choicemaps, traces, interpreters,
combinators — the TPU-native equivalent of the Gen.jl layer the reference
builds on (see SURVEY.md §1 L0)."""

from .distributions import *  # noqa: F401,F403
from .choicemap import *  # noqa: F401,F403
from .gfi import *  # noqa: F401,F403
from .combinators import *  # noqa: F401,F403
