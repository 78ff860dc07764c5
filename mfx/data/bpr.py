"""BPR negative sampling — SURVEY.md C6 (BASELINE.json configs[4]).

Implicit-feedback training triples (user, positive item, sampled negative
item). Negatives are sampled uniformly over the item catalog, seeded and
deterministic per (seed, epoch). Collisions with unobserved positives are
accepted — the standard large-scale approximation (collision probability
equals the dataset density; exact rejection is O(n·deg) host work and
changes AUC by < density).
"""

from __future__ import annotations

import numpy as np

from mfx.data.coo import RatingsCOO

__all__ = ["sample_negatives", "bpr_epoch_triples"]


def sample_negatives(
    n: int, num_items: int, seed: int, epoch: int
) -> np.ndarray:
    rng = np.random.default_rng(np.random.SeedSequence([seed, 0xBB12, epoch]))
    return rng.integers(0, num_items, size=n, dtype=np.int32)


def bpr_epoch_triples(
    coo: RatingsCOO, seed: int, epoch: int, perm: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(users, pos_items, neg_items) for one epoch, in permuted order."""
    neg = sample_negatives(coo.n_ratings, coo.num_items, seed, epoch)
    if perm is None:
        return coo.user, coo.item, neg
    return coo.user[perm], coo.item[perm], neg[perm]
