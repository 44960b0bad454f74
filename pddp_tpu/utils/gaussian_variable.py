"""Reference-layout alias: the reference exposes GaussianVariable as
pddp.utils.gaussian_variable (pddp/utils/gaussian_variable.py); this
package hoists it to pddp_tpu.gaussian_variable. This module keeps the
reference import path working.
"""

from ..gaussian_variable import *  # noqa: F401,F403
from ..gaussian_variable import __all__  # noqa: F401
