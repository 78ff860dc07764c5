from mfx.eval.metrics import rmse, rmse_mae
from mfx.eval.ranking import (
    full_hr_ndcg_at_k, hr_ndcg_at_k, user_topk_metrics,
)

__all__ = [
    "rmse", "rmse_mae",
    "hr_ndcg_at_k", "full_hr_ndcg_at_k", "user_topk_metrics",
]
