from .stats import *  # noqa: F401,F403
