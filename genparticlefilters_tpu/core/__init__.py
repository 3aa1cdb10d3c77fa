"""Core GFI substrate: distributions, choicemaps, traces, interpreters,
combinators — the TPU-native equivalent of the Gen.jl layer the reference
builds on (see SURVEY.md §1 L0)."""

from . import distributions as _distributions
from . import choicemap as _choicemap
from . import gfi as _gfi
from . import combinators as _combinators

from .distributions import *  # noqa: F401,F403
from .choicemap import *  # noqa: F401,F403
from .gfi import *  # noqa: F401,F403
from .combinators import *  # noqa: F401,F403

__all__ = (_distributions.__all__ + _choicemap.__all__ + _gfi.__all__
           + _combinators.__all__)
