"""Model blending (SURVEY.md M-family companion; the Netflix-Prize
ensemble recipe). The reference snapshot ships no code
(/root/reference/README.md:1-2); this layer exists because the model
zoo does — MF, SVD++, timeSVD(++) (their ``as_mf`` views), ALS, iALS
and NMF all produce :class:`MFModel`-shaped predictors whose errors
decorrelate, and a ridge-fit linear blend of them is the standard last
percent of RMSE.

Two pieces, both exact:

- :func:`fit_blend` — ridge-fit blend weights on a validation split.
  Features are each model's predictions; the solve is a tiny
  (M+1)×(M+1) normal equation (M = number of models), with
  per-model predictions computed in chunked device batches.
- :func:`blend_as_mf` — the TPU-native trick: a linear blend of factor
  models IS a factor model. ``Σ_m w_m (p_mu·q_mi + bu_mu + bi_mi +
  mu_m) + c`` rewrites exactly as one concatenated-factor model with
  ``P' = [w_1·P_1 | … | w_M·P_M]``, ``Q' = [Q_1 | … | Q_M]``,
  ``bu' = Σ w_m·bu_m``, ``bi' = Σ w_m·bi_m``, ``mu' = Σ w_m·mu_m + c``.
  The blend therefore rides EVERY existing serving path unchanged —
  exact/fused/sharded top-K, similar-items, npz export — as a single
  rank-``Σ r_m`` MFModel, one MXU matmul per catalog pass.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel

__all__ = ["BlendResult", "fit_blend", "blend_as_mf"]


@dataclasses.dataclass(frozen=True)
class BlendResult:
    """Ridge blend fit: ``score = Σ w_m·model_m + intercept``."""

    weights: np.ndarray          # (M,) float64
    intercept: float
    val_rmse: float              # blend RMSE on the fit split
    member_rmse: np.ndarray      # (M,) each model's own RMSE on it


def _check_models(models: Sequence[MFModel]) -> None:
    if not models:
        raise ValueError("need at least one model to blend")
    U, I = models[0].num_users, models[0].num_items
    for m in models[1:]:
        if (m.num_users, m.num_items) != (U, I):
            raise ValueError(
                "all blended models must share (num_users, num_items); "
                f"got ({U}, {I}) and ({m.num_users}, {m.num_items})"
            )


def _member_predictions(
    models: Sequence[MFModel], coo: RatingsCOO, chunk: int
) -> np.ndarray:
    """(n, M) float64 prediction features, chunked device batches."""
    n, M = coo.n_ratings, len(models)
    X = np.empty((n, M), np.float64)
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        u = jnp.asarray(coo.user[start:stop])
        i = jnp.asarray(coo.item[start:stop])
        for m, model in enumerate(models):
            X[start:stop, m] = np.asarray(model.predict(u, i), np.float64)
    return X


def fit_blend(
    models: Sequence[MFModel],
    val: RatingsCOO,
    reg: float = 1e-4,
    chunk: int = 1 << 20,
) -> BlendResult:
    """Fit ridge blend weights on ``val``: minimize
    ``‖X·w + c − y‖² + reg·n·‖w‖²`` (the intercept is not regularized —
    it absorbs any shared calibration offset). Fit on RAW predictions;
    apply rating clipping at serving time as usual.

    Use a split the members did NOT train on, or the fit rewards
    whichever member memorized hardest.
    """
    _check_models(models)
    if val.n_ratings == 0:
        raise ValueError("fit_blend needs a non-empty validation split")
    n, M = val.n_ratings, len(models)
    X = _member_predictions(models, val, chunk)
    y = val.rating.astype(np.float64)
    # normal equations over [X | 1]; ridge on the M weight coords only
    Xa = np.concatenate([X, np.ones((n, 1))], axis=1)
    A = Xa.T @ Xa
    A[np.arange(M), np.arange(M)] += reg * n
    b = Xa.T @ y
    w = np.linalg.solve(A, b)
    resid = Xa @ w - y
    member = np.sqrt(np.mean((X - y[:, None]) ** 2, axis=0))
    return BlendResult(
        weights=w[:M],
        intercept=float(w[M]),
        val_rmse=float(np.sqrt(np.mean(resid**2))),
        member_rmse=member,
    )


def blend_as_mf(
    models: Sequence[MFModel],
    weights,
    intercept: float = 0.0,
) -> MFModel:
    """The exact single-model view of a linear blend (docstring above).
    Serving cost scales with the summed rank — distill with
    ``mfx.serve`` quantization or re-rank if that matters."""
    _check_models(models)
    weights = np.asarray(weights, np.float32)
    if weights.shape != (len(models),):
        raise ValueError(
            f"weights must be ({len(models)},), got {weights.shape}"
        )
    f = models[0].P.dtype
    # weights cast to f BEFORE multiplying: an f32 scalar would silently
    # promote bf16 member tables to f32, doubling the blend's footprint
    P = jnp.concatenate(
        [jnp.asarray(w, f) * m.P.astype(f)
         for w, m in zip(weights, models)],
        axis=1,
    )
    Q = jnp.concatenate([m.Q.astype(f) for m in models], axis=1)
    bu = sum(jnp.asarray(w, f) * m.bu.astype(f)
             for w, m in zip(weights, models))
    bi = sum(jnp.asarray(w, f) * m.bi.astype(f)
             for w, m in zip(weights, models))
    mu = sum(float(w) * float(m.mu) for w, m in zip(weights, models))
    return MFModel(
        P=P, Q=Q, bu=bu, bi=bi,
        mu=jnp.asarray(mu + intercept, f),
    )
