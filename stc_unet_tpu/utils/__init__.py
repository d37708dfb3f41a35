from .config import Config, ConfigDict
from .logger import get_logger, get_root_logger, print_log
from .misc import collect_env, find_latest_checkpoint
from .registry import Registry, build_from_cfg

__all__ = [
    'Config', 'ConfigDict', 'Registry', 'build_from_cfg', 'get_logger',
    'get_root_logger', 'print_log', 'collect_env', 'find_latest_checkpoint',
]
