"""MFModel — factor-model state (SURVEY.md M1).

The model the reference implies (``R ≈ P·Qᵀ`` with optional user/item/global
bias; ``/root/reference/README.md:1-2`` names the algorithm, BASELINE.json
``configs[1]`` requires the biased variant). State is a JAX pytree of dense
arrays so it jits, shards, and checkpoints like any other JAX model.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["MFModel", "init_model", "baseline_biases"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MFModel:
    """Matrix-factorization state.

    P: [num_users, rank] user factors.
    Q: [num_items, rank] item factors.
    bu: [num_users] user biases (zeros when use_bias=False; kept in the
        pytree so jitted update functions have a static structure).
    bi: [num_items] item biases.
    mu: scalar global mean (not trained; set from the training data).
    """

    P: jax.Array
    Q: jax.Array
    bu: jax.Array
    bi: jax.Array
    mu: jax.Array

    @property
    def rank(self) -> int:
        return self.P.shape[-1]

    @property
    def num_users(self) -> int:
        return self.P.shape[0]

    @property
    def num_items(self) -> int:
        return self.Q.shape[0]

    def predict(self, users: jax.Array, items: jax.Array) -> jax.Array:
        """Batched prediction mu + bu + bi + p·q for id vectors."""
        # mode='clip': callers may pass padded batches whose pad slots
        # carry out-of-range sentinel ids (weight-0 semantics upstream)
        pu = jnp.take(self.P, users, axis=0, mode="clip")
        qi = jnp.take(self.Q, items, axis=0, mode="clip")
        return (
            jnp.sum(pu * qi, axis=-1)
            + jnp.take(self.bu, users, mode="clip")
            + jnp.take(self.bi, items, mode="clip")
            + self.mu
        )

    def astype(self, dtype) -> "MFModel":
        return MFModel(
            P=self.P.astype(dtype),
            Q=self.Q.astype(dtype),
            bu=self.bu.astype(dtype),
            bi=self.bi.astype(dtype),
            mu=self.mu.astype(dtype),
        )

    def save_npz(self, path) -> None:
        """Portable single-file export (plain ``numpy.savez_compressed``)
        for orbax-free deployments — the serving layer (mfx/serve) and
        ``predict`` need nothing but these five arrays. Sharded arrays
        are gathered to host; use mfx.train.checkpoint for no-gather
        sharded checkpoints."""
        import numpy as np

        np.savez_compressed(
            path,
            P=np.asarray(self.P), Q=np.asarray(self.Q),
            bu=np.asarray(self.bu), bi=np.asarray(self.bi),
            mu=np.asarray(self.mu),
        )

    @staticmethod
    def load_npz(path, device: bool = True) -> "MFModel":
        """Inverse of :meth:`save_npz`. ``device=False`` keeps the arrays
        host-resident (numpy) — e.g. for ShardedTopKRecommender's
        host-resident user table at very large user counts."""
        import numpy as np

        with np.load(path) as z:
            arrs = {k: z[k] for k in ("P", "Q", "bu", "bi", "mu")}
        if device:
            arrs = {k: jnp.asarray(v) for k, v in arrs.items()}
        return MFModel(**arrs)


def init_model(
    rng: jax.Array | int,
    num_users: int,
    num_items: int,
    rank: int,
    global_mean: float = 0.0,
    init_scale: float | None = None,
    dtype: Any = jnp.float32,
) -> MFModel:
    """Scaled-normal init; ``init_scale`` defaults to 1/sqrt(rank) so initial
    predictions have O(1) variance around the global mean."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    if init_scale is None:
        init_scale = 1.0 / jnp.sqrt(rank)
    kp, kq = jax.random.split(rng)
    return MFModel(
        P=(jax.random.normal(kp, (num_users, rank), dtype) * init_scale),
        Q=(jax.random.normal(kq, (num_items, rank), dtype) * init_scale),
        bu=jnp.zeros((num_users,), dtype),
        bi=jnp.zeros((num_items,), dtype),
        mu=jnp.asarray(global_mean, dtype),
    )


def baseline_biases(
    coo, mu: float | None = None, damping: float = 10.0
) -> tuple[jax.Array, jax.Array]:
    """Damped-mean bias initialization (Koren's baseline predictor,
    "Factorization Meets the Neighborhood" §2.1): item biases are the
    damped mean residual against the global mean, user biases the damped
    mean of the item-corrected residual —

        b_i = Σ_{u∈R(i)} (r_ui − μ) / (λ + |R(i)|)
        b_u = Σ_{i∈R(u)} (r_ui − μ − b_i) / (λ + |R(u)|)

    Two scatter-adds on device — O(n) with no host loop. Starting SGD
    from these instead of zeros makes epoch-0 predictions the classic
    baseline estimate; the bias rows of rarely-rated users/items shrink
    toward 0 (the damping λ), exactly the regularized fixed point SGD
    would otherwise spend early epochs approaching. Returns (bu, bi) as
    float32; wire via ModelConfig.bias_init='baseline'.
    """
    u = jnp.asarray(coo.user)
    i = jnp.asarray(coo.item)
    r = jnp.asarray(coo.rating, jnp.float32)
    mu = float(coo.global_mean) if mu is None else float(mu)
    res = r - mu
    f = jnp.float32
    cnt_i = jnp.zeros((coo.num_items,), f).at[i].add(1.0)
    bi = jnp.zeros((coo.num_items,), f).at[i].add(res) / (damping + cnt_i)
    res_u = res - jnp.take(bi, i)
    cnt_u = jnp.zeros((coo.num_users,), f).at[u].add(1.0)
    bu = jnp.zeros((coo.num_users,), f).at[u].add(res_u) / (damping + cnt_u)
    return bu, bi
