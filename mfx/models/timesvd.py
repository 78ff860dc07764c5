"""Temporal-dynamics MF — time-binned item biases + user drift.

Koren's "Collaborative Filtering with Temporal Dynamics" (KDD 2009)
bias-level model on top of biased MF:

    r_hat(u, i, t) = mu + b_u + alpha_u * dev_u(t) + b_i + b_{i,Bin(t)}
                        + p_u . q_i

    dev_u(t) = sign(t - t_u) * |t - t_u|^beta   (t in normalized units,
                t_u = user u's mean training-rating time, beta ~ 0.4)

Item tastes drift slowly (captured by ``n_bins`` coarse time bins of the
item bias); user behavior drifts per-user (captured by the learned drift
coefficient ``alpha_u`` against the smooth deviation curve). The reference
snapshot ships no code (/root/reference/README.md:1-2 names a plain MF-SGD
assignment); this module extends the BASELINE.json capability ladder with
the canonical temporal upgrade of exactly that model family, enabled by
the per-rating timestamps the loaders keep (mfx/data/coo.py).

TPU-native mapping: per-rating time features (bin index, deviation value)
are computed ONCE host-side in float64 (raw dataset time units never
enter the f32 device path — unix seconds would lose ~2 minutes of
precision in f32) and ride the padded epoch batches as two extra columns;
the device update stays the fused snapshot-minibatch form of the jnp SGD
path with two extra bias-like scatter streams. ``as_mf(...)`` folds the
temporal terms at a reference time into a plain :class:`MFModel`, so
serving / ranking eval / checkpoints reuse the MF machinery unchanged
(the SVD++ pattern, mfx/models/svdpp.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mfx.models.mf import MFModel

__all__ = [
    "TimeFeatures", "fit_time_features", "TimeSVDModel", "init_timesvd",
]


@dataclasses.dataclass(frozen=True)
class TimeFeatures:
    """Host-side time featurizer (NOT a jax pytree — raw dataset time
    units stay in int64/float64 on the host; only the derived f32/int32
    feature columns go to device).

    t0/t1:  raw-unit train time range (int64 scalars).
    span:   max(1, t1 - t0) as float64 — the dev normalizer.
    edges:  [n_bins - 1] raw-unit bin boundaries (equal-count quantiles
            of the train times; ``searchsorted(edges, t, 'right')`` is
            the bin index, so test times beyond the train range clamp
            into the first/last bin automatically).
    tu:     [num_users] float64 mean raw train time per user (users with
            no train ratings get the global mean time).
    beta:   the deviation exponent.
    """

    t0: int
    t1: int
    span: float
    edges: np.ndarray
    tu: np.ndarray
    beta: float

    @property
    def n_bins(self) -> int:
        return len(self.edges) + 1

    def bins(self, ts: np.ndarray) -> np.ndarray:
        """Raw timestamps -> int32 bin ids in [0, n_bins)."""
        return np.searchsorted(self.edges, ts, side="right").astype(np.int32)

    def dev(self, users: np.ndarray, ts: np.ndarray) -> np.ndarray:
        """Raw (user, timestamp) -> f32 dev_u(t) (float64 internally)."""
        d = (ts.astype(np.float64) - self.tu[users]) / self.span
        return (np.sign(d) * np.abs(d) ** self.beta).astype(np.float32)

    def features(self, users, ts) -> tuple[np.ndarray, np.ndarray]:
        return self.bins(ts), self.dev(users, ts)


def fit_time_features(
    coo, n_bins: int = 30, beta: float = 0.4
) -> TimeFeatures:
    """Fit the featurizer on the TRAIN split (deterministic — rebuilt
    identically on resume, like SVD++'s nu)."""
    ts = coo.timestamp
    if ts is None:
        raise ValueError(
            "temporal model needs coo.timestamp; this dataset was loaded "
            "without a time column"
        )
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    t0, t1 = int(ts.min()), int(ts.max())
    # equal-count bins: each bin sees ~the same number of train ratings
    # (calendar-uniform bins would starve sparse eras). Duplicate edges
    # from heavy ties just leave some bins empty — harmless.
    edges = np.quantile(
        ts, np.arange(1, n_bins, dtype=np.float64) / n_bins
    ).astype(np.int64) if n_bins > 1 else np.zeros(0, np.int64)
    tsum = np.zeros(coo.num_users, np.float64)
    cnt = np.zeros(coo.num_users, np.int64)
    np.add.at(tsum, coo.user, ts.astype(np.float64))
    np.add.at(cnt, coo.user, 1)
    mean_all = float(ts.mean())
    tu = np.where(cnt > 0, tsum / np.maximum(cnt, 1), mean_all)
    return TimeFeatures(
        t0=t0, t1=t1, span=float(max(1, t1 - t0)),
        edges=edges, tu=tu, beta=float(beta),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TimeSVDModel:
    """Learned temporal-MF state (a jax pytree of arrays only; the host
    featurizer travels separately — see module docstring).

    P/Q/bu/bi/mu: as MFModel.
    bt:    [num_items, n_bins] time-binned item bias (zeros-init: the
           model starts exactly at the biased-MF point).
    alpha: [num_users] user drift coefficient (zeros-init).
    """

    P: jax.Array
    Q: jax.Array
    bu: jax.Array
    bi: jax.Array
    mu: jax.Array
    bt: jax.Array
    alpha: jax.Array

    @property
    def rank(self) -> int:
        return self.P.shape[-1]

    @property
    def num_users(self) -> int:
        return self.P.shape[0]

    @property
    def num_items(self) -> int:
        return self.Q.shape[0]

    @property
    def n_bins(self) -> int:
        return self.bt.shape[-1]

    def predict_t(self, users, items, tbins, devs) -> jax.Array:
        """Time-aware prediction from featurized columns (int32 bins +
        f32 devs — see TimeFeatures.features)."""
        pu = jnp.take(self.P, users, axis=0, mode="clip")
        qi = jnp.take(self.Q, items, axis=0, mode="clip")
        pred = jnp.sum(pu * qi, axis=-1) + self.mu
        pred = pred + jnp.take(self.bu, users, mode="clip")
        pred = pred + jnp.take(self.bi, items, mode="clip")
        flat = items * self.n_bins + tbins
        pred = pred + jnp.take(self.bt.reshape(-1), flat, mode="clip")
        return pred + jnp.take(self.alpha, users, mode="clip") * devs

    def as_mf(
        self, feats: TimeFeatures | None = None, at: int | None = None
    ) -> MFModel:
        """The biased-MF view with the temporal terms folded in at one
        reference time ``at`` (raw units; default = the end of the train
        window — the 'serve now' state). Everything downstream of
        training — serving (mfx.serve), ranking eval, Orbax checkpoints
        — consumes this view unchanged. Without ``feats`` the temporal
        terms are dropped (the static-bias view)."""
        if feats is None:
            return MFModel(P=self.P, Q=self.Q, bu=self.bu, bi=self.bi,
                           mu=self.mu)
        t_ref = feats.t1 if at is None else int(at)
        b = int(feats.bins(np.asarray([t_ref], np.int64))[0])
        dev = jnp.asarray(
            feats.dev(np.arange(len(feats.tu)),
                      np.full(len(feats.tu), t_ref, np.int64))
        )
        return MFModel(
            P=self.P, Q=self.Q,
            bu=self.bu + self.alpha * dev,
            bi=self.bi + self.bt[:, b],
            mu=self.mu,
        )

    def save_npz(self, path) -> None:
        """Full-state single-file export (the MF view alone cannot resume
        training — bt/alpha would be lost)."""
        np.savez_compressed(
            path,
            P=np.asarray(self.P), Q=np.asarray(self.Q),
            bu=np.asarray(self.bu), bi=np.asarray(self.bi),
            mu=np.asarray(self.mu), bt=np.asarray(self.bt),
            alpha=np.asarray(self.alpha),
        )

    @staticmethod
    def load_npz(path) -> "TimeSVDModel":
        with np.load(path) as z:
            arrs = {
                k: jnp.asarray(z[k])
                for k in ("P", "Q", "bu", "bi", "mu", "bt", "alpha")
            }
        return TimeSVDModel(**arrs)


def init_timesvd(
    rng: jax.Array | int,
    num_users: int,
    num_items: int,
    rank: int,
    n_bins: int,
    *,
    global_mean: float = 0.0,
    init_scale: float | None = None,
    dtype: Any = jnp.float32,
    base: MFModel | None = None,
) -> TimeSVDModel:
    """Scaled-normal P/Q (or warm-start from ``base``), zero temporal
    tables (start == biased MF)."""
    if base is None:
        from mfx.models.mf import init_model

        base = init_model(
            rng, num_users, num_items, rank,
            global_mean=global_mean, init_scale=init_scale, dtype=dtype,
        )
    return TimeSVDModel(
        P=base.P, Q=base.Q, bu=base.bu, bi=base.bi, mu=base.mu,
        bt=jnp.zeros((num_items, n_bins), base.P.dtype),
        alpha=jnp.zeros((num_users,), base.P.dtype),
    )
