from .cache import enable_compilation_cache
from .log import get_logger
from .timer import StageTimer
