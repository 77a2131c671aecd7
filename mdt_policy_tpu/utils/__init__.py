from .ema import ema_decay, ema_update
from .schedulers import tri_stage_schedule
from .checkpoint import Checkpointer, latest_checkpoint
from .fnv import fnv1_32, fnv1a_32, fnv1_64, fnv1a_64
from .misc import (
    get_git_commit_hash,
    get_portion_of_batch_ids,
    initialize_pretrained_weights,
    print_system_env_info,
    timeit,
)
