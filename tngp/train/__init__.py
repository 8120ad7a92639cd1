from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .ema import ema_init, ema_update
from .metrics import LPIPSMeter, PSNRMeter, SSIMMeter
from .trainer import Trainer, make_optimizer

__all__ = [
    "latest_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
    "ema_init",
    "ema_update",
    "LPIPSMeter",
    "PSNRMeter",
    "SSIMMeter",
    "Trainer",
    "make_optimizer",
]
