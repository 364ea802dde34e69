from .clock import Clock
from .profiler import Profiler, profile_scope
from .properties import Properties
