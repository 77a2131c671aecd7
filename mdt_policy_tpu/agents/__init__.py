from .config import LRSchedulerConfig, MDTVConfig, OptimizerConfig
from .mdt_agent import MDTAgentNet, MDTConfig
from .mdt_agent import init_agent as init_mdt_agent
from .mdtv_agent import MDTVPolicy as MDTPolicy  # uniform `perceive` entry
from .mdtv_agent import (
    MDTVAgentNet,
    MDTVPolicy,
    TrainState,
    denoise_actions,
    init_agent,
    make_optimizer,
    train_step,
)
