from segtpu.utils.helpers import colorize_mask, dir_exists  # noqa: F401
from segtpu.utils.logger import Logger  # noqa: F401
