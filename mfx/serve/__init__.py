"""Serving layer — batched top-K recommendation from trained models,
plus cold-start fold-in of new user/item histories (explicit LS and
implicit iALS-style solves)."""

from mfx.serve.topk import TopKRecommender, similar_items
from mfx.serve.sharded import ShardedTopKRecommender, similar_items_sharded
from mfx.serve.fused import (
    FusedShardedTopKRecommender, FusedTopKRecommender, similar_items_fused,
)
from mfx.serve.foldin import (
    fold_in, fold_in_batch, fold_in_implicit, recommend_cold,
)
from mfx.serve.rerank import MMRRecommender, rerank_mmr

__all__ = [
    "TopKRecommender",
    "ShardedTopKRecommender",
    "FusedTopKRecommender",
    "FusedShardedTopKRecommender",
    "similar_items",
    "similar_items_fused",
    "similar_items_sharded",
    "fold_in",
    "fold_in_batch",
    "fold_in_implicit",
    "recommend_cold",
    "MMRRecommender",
    "rerank_mmr",
]
