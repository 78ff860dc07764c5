"""Public API — SURVEY.md L7.

>>> import mfx.api as mfx
>>> result = mfx.train(mfx.preset("ml100k_rank16"))
>>> mfx.evaluate(result.model, test_coo)
"""

from __future__ import annotations

from mfx.config import (
    TrainConfig, DataConfig, ModelConfig, SGDConfig, SVDPPConfig,
    TimeSVDConfig, TimeSVDPPConfig, ALSConfig, NMFConfig, IALSConfig,
    BPRConfig, ParallelConfig, preset, apply_overrides, PRESETS,
)
from mfx.data.coo import RatingsCOO
from mfx.data.loaders import load_dataset, dataset_names
from mfx.data.split import (
    chronological_split, leave_one_out_split, train_test_split,
    user_chronological_split,
)
from mfx.eval.metrics import rmse, rmse_mae, sampled_auc
from mfx.eval.ranking import (
    full_hr_ndcg_at_k, hr_ndcg_at_k, user_topk_metrics,
)
from mfx.models.mf import MFModel, init_model
from mfx.models.svdpp import SVDppModel, init_svdpp
from mfx.models.timesvd import TimeSVDModel, init_timesvd, fit_time_features
from mfx.models.ensemble import BlendResult, blend_as_mf, fit_blend
from mfx.models.compress import CompressResult, compress_model
from mfx.serve import (
    FusedTopKRecommender, MMRRecommender, ShardedTopKRecommender,
    TopKRecommender, fold_in, recommend_cold, rerank_mmr, similar_items,
)
from mfx.train.checkpoint import load_checkpoint, save_checkpoint
from mfx.train.driver import TrainResult, train
from mfx.train.online import grow_model, partial_fit
from mfx.tune import SweepResult, sweep_sgd

__all__ = [
    "TrainConfig", "DataConfig", "ModelConfig", "SGDConfig", "SVDPPConfig",
    "TimeSVDConfig", "TimeSVDPPConfig", "ALSConfig", "NMFConfig",
    "IALSConfig", "BPRConfig",
    "ParallelConfig", "preset", "apply_overrides", "PRESETS",
    "RatingsCOO", "load_dataset", "dataset_names", "train_test_split",
    "chronological_split", "user_chronological_split",
    "leave_one_out_split",
    "rmse", "rmse_mae", "sampled_auc", "hr_ndcg_at_k", "full_hr_ndcg_at_k",
    "user_topk_metrics", "evaluate",
    "MFModel", "init_model", "SVDppModel", "init_svdpp",
    "TimeSVDModel", "init_timesvd", "fit_time_features",
    "load_checkpoint", "save_checkpoint",
    "TrainResult", "train", "TopKRecommender", "ShardedTopKRecommender",
    "FusedTopKRecommender", "MMRRecommender", "rerank_mmr",
    "similar_items", "fold_in", "recommend_cold",
    "BlendResult", "fit_blend", "blend_as_mf",
    "CompressResult", "compress_model",
    "grow_model", "partial_fit",
    "SweepResult", "sweep_sgd",
]


def evaluate(
    model: MFModel,
    coo: RatingsCOO,
    implicit: bool = False,
    clip: tuple[float, float] | None = (0.5, 5.0),
    ranking_k: int | None = None,
    ranking_protocol: str = "sampled",
    train: RatingsCOO | None = None,
) -> dict:
    """Held-out metrics: RMSE/MAE (explicit; predictions clipped to the
    rating scale, matching the training driver) or sampled AUC (implicit).

    ``ranking_k``: additionally report ranking metrics at this K.
    ``ranking_protocol``: 'sampled' (NCF-style HR/NDCG/MRR, 100 drawn
    candidates per positive — pass ``pos_keys`` built over train ∪ test
    to ``hr_ndcg_at_k`` directly for the unbiased variant), 'full'
    (HR/NDCG/MRR against the entire catalog — the bias-free protocol;
    give ``train`` so its interactions are excluded from the competitor
    set), or 'user' (per-user multi-positive Recall/Precision/NDCG/MAP +
    coverage/novelty over the served top-K lists)."""
    out = {}
    if implicit:
        out["auc"] = sampled_auc(model, coo)
    else:
        out["rmse"], out["mae"] = rmse_mae(model, coo, clip=clip)
    if ranking_k is not None:
        if ranking_protocol == "full":
            r = full_hr_ndcg_at_k(model, coo, train=train, k=ranking_k)
        elif ranking_protocol == "sampled":
            r = hr_ndcg_at_k(model, coo, k=ranking_k)
        elif ranking_protocol == "user":
            r = user_topk_metrics(model, coo, train=train, k=ranking_k)
        else:
            raise ValueError(
                "ranking_protocol must be 'sampled', 'full', or 'user', "
                f"got {ranking_protocol!r}"
            )
        out.update({f"{name}@{ranking_k}": v for name, v in r.items()})
    return out
