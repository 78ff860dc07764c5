"""Serving layer — batched top-K recommendation from trained models."""

from mfx.serve.topk import TopKRecommender

__all__ = ["TopKRecommender"]
