from .ema import ema_decay, ema_update
from .schedulers import tri_stage_schedule
