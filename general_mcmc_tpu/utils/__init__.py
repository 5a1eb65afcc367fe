from .progress import ProgressRenderer
from .timer import Timer
