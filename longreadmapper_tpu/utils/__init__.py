from .log import Logger, new_logger
from .rng import Lcg48, replace_n
from .config import Params, read_params

__all__ = ["Logger", "new_logger", "Lcg48", "replace_n", "Params", "read_params"]
