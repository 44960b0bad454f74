"""Reference-layout alias: the reference exposes the state-distribution
codec as pddp.utils.encoding (pddp/utils/encoding.py); this package hoists
it to pddp_tpu.encoding (the z-vector is the universal currency of every
layer, SURVEY §1). This module keeps the reference import path working.
"""

from ..encoding import *  # noqa: F401,F403
from ..encoding import __all__  # noqa: F401
