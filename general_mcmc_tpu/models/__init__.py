from . import distributions
from .distributions import *  # noqa: F401,F403
