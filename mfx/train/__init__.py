from mfx.train.driver import train, TrainResult
from mfx.train.checkpoint import save_checkpoint, load_checkpoint, latest_step
from mfx.train.logging import MetricsLogger
from mfx.train.online import grow_model, partial_fit
from mfx.train.profile import maybe_trace

__all__ = [
    "train", "TrainResult", "save_checkpoint", "load_checkpoint",
    "latest_step", "MetricsLogger", "maybe_trace",
    "grow_model", "partial_fit",
]
