"""Train/test splitting and epoch shuffling (SURVEY.md C3).

Seeded and reproducible: the same (seed, n) always yields the same split and
the same per-epoch permutation stream, which is a precondition for the
bitwise-determinism guarantees in BASELINE.json's north star.
"""

from __future__ import annotations

import numpy as np

from mfx.data.coo import RatingsCOO

__all__ = ["train_test_split", "epoch_permutation"]


def train_test_split(
    coo: RatingsCOO, test_frac: float = 0.1, seed: int = 0
) -> tuple[RatingsCOO, RatingsCOO]:
    """Uniform held-out split. Returns (train, test)."""
    if not 0.0 <= test_frac < 1.0:
        raise ValueError(f"test_frac must be in [0, 1), got {test_frac}")
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0x5B117]))
    n = coo.n_ratings
    n_test = int(round(n * test_frac))
    perm = rng.permutation(n)
    test_idx = perm[:n_test]
    train_idx = perm[n_test:]
    return coo.select(train_idx), coo.select(test_idx)


def epoch_permutation(n: int, seed: int, epoch: int) -> np.ndarray:
    """Deterministic per-epoch permutation of rating order."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xE70C, epoch]))
    return rng.permutation(n).astype(np.int64)
