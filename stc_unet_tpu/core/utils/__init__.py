from .dist_util import sync_random_seed
from .misc import add_prefix

__all__ = ['add_prefix', 'sync_random_seed']
