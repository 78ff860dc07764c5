"""Train/test splitting and epoch shuffling (SURVEY.md C3).

Seeded and reproducible: the same (seed, n) always yields the same split and
the same per-epoch permutation stream, which is a precondition for the
bitwise-determinism guarantees in BASELINE.json's north star.
"""

from __future__ import annotations

import numpy as np

from mfx.data.coo import RatingsCOO

__all__ = ["train_test_split", "leave_one_out_split", "epoch_permutation"]


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


def leave_one_out_split(
    coo: RatingsCOO, seed: int = 0
) -> tuple[RatingsCOO, RatingsCOO]:
    """Leave-one-out split: ONE seeded-random interaction per user held
    out — the canonical protocol for sampled ranking evaluation (NCF
    style; pairs with ``mfx.eval.ranking.hr_ndcg_at_k``, which ranks
    each held-out positive against sampled candidates). Users with a
    single interaction stay entirely in train (holding their only
    interaction out would leave an untrainable user row). RatingsCOO
    carries no timestamps, so the held-out interaction is seeded-random
    per user rather than the latest; the draw is reproducible.
    Returns (train, test)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0x100]))
    n = coo.n_ratings
    # per-user contiguous runs via a stable sort, one uniform pick each
    order = np.argsort(coo.user, kind="stable")
    users_sorted = coo.user[order]
    starts = np.searchsorted(users_sorted, np.arange(coo.num_users + 1))
    counts = np.diff(starts)
    active = np.flatnonzero(counts >= 2)
    picks = starts[active] + rng.integers(0, counts[active])
    test_idx = order[picks]
    mask = np.ones(n, bool)
    mask[test_idx] = False
    return coo.select(np.flatnonzero(mask)), coo.select(np.sort(test_idx))


def epoch_permutation(n: int, seed: int, epoch: int) -> np.ndarray:
    """Deterministic per-epoch permutation of rating order."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xE70C, epoch]))
    return rng.permutation(n).astype(np.int64)
