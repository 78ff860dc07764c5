from mfx.parallel.data_parallel import (
    train_epochs_dp,
    train_epochs_bpr_dp,
)
from mfx.parallel.sharded import train_epochs_ring
from mfx.parallel.hybrid import train_epochs_hybrid
from mfx.parallel.bpr_sharded import train_epochs_bpr_ring

__all__ = [
    "train_epochs_dp",
    "train_epochs_bpr_dp",
    "train_epochs_ring",
    "train_epochs_hybrid",
    "train_epochs_bpr_ring",
]
