from .config import Config, ConfigDict
from .logger import get_logger, get_root_logger, print_log
from .misc import collect_env, find_latest_checkpoint
from .registry import Registry, build_from_cfg
from .set_env import setup_multi_processes
from .util_distribution import (build_ddp, build_dp, get_device,
                                get_dist_info, init_dist)

__all__ = [
    'Config', 'ConfigDict', 'Registry', 'build_from_cfg', 'get_logger',
    'get_root_logger', 'print_log', 'collect_env', 'find_latest_checkpoint', 'setup_multi_processes',
    'build_ddp', 'build_dp', 'get_device', 'get_dist_info', 'init_dist',
]
