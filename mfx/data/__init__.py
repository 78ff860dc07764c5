from mfx.data.coo import RatingsCOO
from mfx.data.loaders import load_dataset, dataset_names
from mfx.data.split import (train_test_split, leave_one_out_split,
                            epoch_permutation)
from mfx.data import partition, synthetic

__all__ = [
    "RatingsCOO", "load_dataset", "dataset_names", "train_test_split", "leave_one_out_split",
    "epoch_permutation", "partition", "synthetic",
]
