from .config import LRSchedulerConfig, MDTVConfig, OptimizerConfig
from .mdtv_agent import (
    MDTVAgentNet,
    MDTVPolicy,
    TrainState,
    denoise_actions,
    init_agent,
    make_optimizer,
    train_step,
)
