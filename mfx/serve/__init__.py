"""Serving layer — batched top-K recommendation from trained models."""

from mfx.serve.topk import TopKRecommender
from mfx.serve.sharded import ShardedTopKRecommender

__all__ = ["TopKRecommender", "ShardedTopKRecommender"]
