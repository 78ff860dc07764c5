"""SVD++ — biased MF extended with implicit-feedback item factors.

Koren's SVD++ (KDD 2008) models *who rated what* as signal on top of the
rating values: each item gets a second factor row ``y_j`` and a user's
representation becomes

    x_u = p_u + |N(u)|^{-1/2} * sum_{j in N(u)} y_j

with prediction ``mu + b_u + b_i + q_i . x_u`` (N(u) = items user u
rated). The reference snapshot ships no code (/root/reference/
README.md:1-2 names a plain MF-SGD assignment); this module extends the
BASELINE.json capability ladder with the canonical quality upgrade of
exactly that model family — the Netflix-Prize-era step beyond
``configs[1]``'s biased MF.

TPU-native mapping: the implicit sums are one ``segment_sum`` over the
COO per refresh (an MXU-free streaming op), after which the model *is* a
biased MF over the effective table ``X = P + S`` — so training, eval,
serving, and checkpointing all reuse the MF machinery via
:meth:`SVDppModel.as_mf`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from mfx.models.mf import MFModel

__all__ = ["SVDppModel", "init_svdpp", "implicit_scale", "implicit_sums"]


def implicit_scale(user: jax.Array, num_users: int) -> jax.Array:
    """Per-user ``|N(u)|^{-1/2}`` from the training COO's user column
    (0.0 for users with no ratings)."""
    deg = jax.ops.segment_sum(
        jnp.ones_like(user, jnp.float32), user, num_segments=num_users
    )
    return jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1.0)), 0.0)


def implicit_sums(
    Y: jax.Array, user: jax.Array, item: jax.Array, nu: jax.Array
) -> jax.Array:
    """S[u] = nu_u * sum_{j in N(u)} Y[j] — one gather + segment_sum."""
    return nu[:, None] * jax.ops.segment_sum(
        jnp.take(Y, item, axis=0), user, num_segments=nu.shape[0]
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SVDppModel:
    """SVD++ state: an :class:`MFModel` plus implicit item factors.

    P:  [num_users, rank] explicit user factors.
    Q:  [num_items, rank] item factors.
    Y:  [num_items, rank] implicit item factors (zeros-init: the model
        then starts exactly at the biased-MF point and learns the
        implicit term from there).
    bu/bi/mu: biases and global mean, as in MFModel.
    nu: [num_users] cached |N(u)|^{-1/2} of the training set.
    """

    P: jax.Array
    Q: jax.Array
    Y: jax.Array
    bu: jax.Array
    bi: jax.Array
    mu: jax.Array
    nu: jax.Array

    @property
    def rank(self) -> int:
        return self.P.shape[-1]

    @property
    def num_users(self) -> int:
        return self.P.shape[0]

    @property
    def num_items(self) -> int:
        return self.Q.shape[0]

    def as_mf(self, S: jax.Array | None = None, *, user=None, item=None) -> MFModel:
        """The equivalent biased-MF view ``X = P + S`` (S from the given
        training COO columns, or passed in precomputed). Everything
        downstream of training — eval (mfx.eval), serving (mfx.serve),
        Orbax checkpoints — consumes this view unchanged."""
        if S is None:
            if user is None or item is None:
                raise ValueError("as_mf needs S, or the training (user, item) columns")
            S = implicit_sums(self.Y, user, item, self.nu)
        return MFModel(P=self.P + S, Q=self.Q, bu=self.bu, bi=self.bi, mu=self.mu)

    def save_npz(self, path) -> None:
        """Full-state single-file export (the MF view alone cannot resume
        training — Y would be lost)."""
        import numpy as np

        np.savez_compressed(
            path,
            P=np.asarray(self.P), Q=np.asarray(self.Q), Y=np.asarray(self.Y),
            bu=np.asarray(self.bu), bi=np.asarray(self.bi),
            mu=np.asarray(self.mu), nu=np.asarray(self.nu),
        )

    @staticmethod
    def load_npz(path) -> "SVDppModel":
        import numpy as np

        with np.load(path) as z:
            arrs = {k: jnp.asarray(z[k]) for k in ("P", "Q", "Y", "bu", "bi", "mu", "nu")}
        return SVDppModel(**arrs)


def init_svdpp(
    rng: jax.Array | int,
    num_users: int,
    num_items: int,
    rank: int,
    *,
    train_user: jax.Array,
    train_item: jax.Array,
    global_mean: float = 0.0,
    init_scale: float | None = None,
    dtype: Any = jnp.float32,
) -> SVDppModel:
    """Scaled-normal P/Q, zero Y (start == biased MF), nu from the train COO."""
    from mfx.models.mf import init_model

    base = init_model(
        rng, num_users, num_items, rank,
        global_mean=global_mean, init_scale=init_scale, dtype=dtype,
    )
    nu = implicit_scale(jnp.asarray(train_user), num_users).astype(dtype)
    del train_item  # only the user column defines N(u) sizes
    return SVDppModel(
        P=base.P, Q=base.Q, Y=jnp.zeros_like(base.Q),
        bu=base.bu, bi=base.bi, mu=base.mu, nu=nu,
    )
