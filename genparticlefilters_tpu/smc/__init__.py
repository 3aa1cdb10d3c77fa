"""SMC operations layer — the TPU-native counterparts of the reference's
public verbs (SURVEY.md §2, C2/C8-C15)."""

from .state import *  # noqa: F401,F403
from .initialize import *  # noqa: F401,F403
from .update import *  # noqa: F401,F403
from .resample import *  # noqa: F401,F403
from .rejuvenate import *  # noqa: F401,F403
from .translate import *  # noqa: F401,F403
from .statistics import *  # noqa: F401,F403
from ..utils.weights import (lognorm, softmax, safe_softmax)  # noqa: F401
from ..utils.stratification import choiceproduct  # noqa: F401
