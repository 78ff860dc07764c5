"""SVD++ trainer — batched TPU-native variant of Koren (KDD 2008).

The classical algorithm updates ``y_j`` for every item of the active user
inside the per-rating loop — O(nnz * avg_degree) scattered row updates,
the most scatter-hostile loop in the MF family. The TPU-native variant
restructures it around *epoch-frozen implicit sums*:

1. refresh   ``S_u = nu_u * sum_{j in N(u)} y_j``   (one segment_sum)
2. SGD epoch on the equivalent biased MF over ``X = P + S``
   (reuses the minibatch machinery of mfx/solvers/sgd.py verbatim:
   same kernels, same conflict-free/fixed partitioners, same
   snapshot-minibatch semantics; d/dp == d/dx so updating X updates P)
3. one exact full-batch gradient step on Y at the epoch-end snapshot:
       A_u    = sum_{i in R(u)} e_ui q_i          (segment_sum)
       y_j   += lr_y * (sum_{u: j in N(u)} nu_u A_u  -  reg_y deg_j y_j)
   — two streaming passes over the COO, no per-user loop.

Step 3 is the exact gradient of the SVD++ objective in Y at frozen
(X, Q, b) — tested against ``jax.grad`` (tests/unit/test_svdpp.py). With
``Y = 0`` at init, epoch 0 is *exactly* the plain biased-MF epoch, so the
model family strictly contains configs[1]'s and departs from it only as
the implicit term earns error reduction.

Reference lineage: the reference snapshot ships no code
(/root/reference/README.md:1-2); this extends the BASELINE.json ladder
with the canonical quality step beyond biased MF on the same data.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import SVDPPConfig, SGDConfig
from mfx.data import partition as part
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.models.svdpp import SVDppModel, implicit_sums
from mfx.solvers.sgd import plan_epoch, _epoch_scan

__all__ = ["train_epochs_svdpp", "y_gradient_step", "svdpp_run_constants"]


@functools.partial(jax.jit, static_argnames=("use_bias", "tr_eta"))
def y_gradient_step(
    Y, X, Q, bu, bi, mu, nu, deg_i, y_scale, batches, lr_y, reg_y,
    tr_eta=None,
    *, use_bias: bool
):
    """One full-batch gradient step on Y at frozen (X, Q, biases).

    ``batches`` holds the whole training COO as padded [nc, C] chunks
    (users/items/ratings/weights — weight 0 and out-of-range sentinel ids
    on pads) so the residual stream is bounded-memory at any nnz.
    Matches the repo-wide step convention ``y += lr (-dL/dy / 2)``:
    per-occurrence residual pull minus per-occurrence L2 (deg_j-scaled).

    ``y_scale`` ([num_items]) preconditions the residual pull per item —
    with all-ones this is the exact gradient (tested vs jax.grad); the
    trainer passes the ``min(1, y_trust / c_j)`` trust cap, the same
    hot-row divergence control as SGDConfig.dup_trust: item j accumulates
    c_j = sum_{u: j in N(u)} sqrt(|R(u)|) same-snapshot contributions, so
    hot items take an epoch-batched step whose curvature*count product
    would exceed the stable region without the cap.
    """
    num_users = X.shape[0]

    def resid_body(A, b):
        pu = jnp.take(X, b["users"], axis=0, mode="clip")
        qi = jnp.take(Q, b["items"], axis=0, mode="clip")
        pred = jnp.sum(pu * qi, axis=-1) + mu
        if use_bias:
            pred = pred + jnp.take(bu, b["users"], mode="clip")
            pred = pred + jnp.take(bi, b["items"], mode="clip")
        e = (b["ratings"] - pred) * b["weights"]
        A = A + jax.ops.segment_sum(
            e[:, None] * qi, b["users"], num_segments=num_users,
            indices_are_sorted=False, unique_indices=False,
        )
        return A, jnp.sum(e * e)

    A0 = jnp.zeros_like(X)
    A, sqs = jax.lax.scan(resid_body, A0, batches)
    contrib_u = A * nu[:, None]  # nu_u * A_u, per user

    def scatter_body(G, b):
        c = jnp.take(contrib_u, b["users"], axis=0, mode="clip")
        c = c * b["weights"][:, None]
        # pads carry out-of-range item sentinels -> dropped by the scatter
        G = G.at[b["items"]].add(c, mode="drop")
        return G, None

    G, _ = jax.lax.scan(scatter_body, jnp.zeros_like(Y), batches)
    eta = Y_TR_ETA if tr_eta is None else tr_eta
    Ynew = _apply_y_step(Y, y_scale[:, None] * G, deg_i, lr_y, reg_y, eta)
    return Ynew, jnp.sum(sqs)


# Production stabilization of the full-batch Y step (r4). At
# multi-million-rating Zipf scale the linear full-batch step diverges —
# measured IDENTICALLY on the jnp and blocked temporal paths, so it is a
# property of the epoch-batched step, not a kernel. Two mechanisms:
#   1. the L2 term: the linear form ``-lr*reg*deg_j*y_j`` is the
#      first-order expansion of deg_j per-occurrence shrinks; for hot
#      items lr*reg*deg_j >> 2 (0.01*0.02*3e5 = 60) and the "shrink"
#      becomes a sign-flipping amplifier — |Y| multiplies ~|1-60| per
#      epoch, the geometric blowup observed on chip. Production mode
#      applies the EXACT sequential shrink ``1-(1-lr*reg)^deg`` (what
#      the classical per-rating loop does), which lives in [0, 1] at any
#      degree.
#   2. the pull: a coherent cross-item mode can still grow through the
#      Y-step -> SGD-epoch -> S-refresh alternation; the trust-region
#      clip scales the WHOLE pull (direction preserved, deterministic)
#      so the largest per-row move is at most Y_TR_ETA*(1 + max row
#      norm of Y) per epoch.
# ``tr_eta=0`` selects the pure full-batch-gradient semantics (linear
# L2, no clip) — the jax.grad exactness contract the unit tests pin.
Y_TR_ETA = 0.1


def _apply_y_step(Y, pull, deg_i, lr_y, reg_y, eta):
    if eta and eta > 0.0:  # production mode (eta is static)
        sn = jnp.sqrt(jnp.max(jnp.sum(pull * pull, axis=1)))
        yn = jnp.sqrt(jnp.max(jnp.sum(Y * Y, axis=1)))
        cap = eta * (1.0 + yn)
        factor = jnp.minimum(1.0, cap / jnp.maximum(lr_y * sn, 1e-30))
        base = jnp.clip(1.0 - lr_y * reg_y, 1e-12, 1.0)
        shrink = 1.0 - jnp.exp(deg_i * jnp.log(base))
        return Y + lr_y * factor * pull - shrink[:, None] * Y
    return Y + lr_y * (pull - reg_y * deg_i[:, None] * Y)


def _coo_chunks(train: RatingsCOO, chunk: int) -> dict[str, jax.Array]:
    """The whole COO as device-resident padded [nc, C] chunk tensors."""
    order = np.arange(train.n_ratings, dtype=np.int64)
    arrays = part.pad_to_batches(
        train.user, train.item, train.rating, order, chunk,
        num_users=train.num_users, num_items=train.num_items,
    )
    return {k: jnp.asarray(v) for k, v in arrays.items()}


def svdpp_run_constants(model: MFModel, train: RatingsCOO, cfg,
                        chunk: int | None):
    """Degree-derived run constants shared by the single-device, DP, and
    timesvdpp trainers: (user_dev, item_dev, nu, deg_i, y_scale, chunks).
    ``cfg`` needs only a ``y_trust`` field; ``chunk=None`` skips building
    the padded COO chunk tensors (timesvdpp builds its own with the
    temporal extra columns)."""
    user_dev = jnp.asarray(train.user)
    item_dev = jnp.asarray(train.item)
    from mfx.models.svdpp import implicit_scale

    nu = implicit_scale(user_dev, train.num_users).astype(model.P.dtype)
    deg_i = jax.ops.segment_sum(
        jnp.ones_like(item_dev, jnp.float32), item_dev,
        num_segments=train.num_items,
    ).astype(model.P.dtype)
    # trust cap (see y_gradient_step): c_j = sum_{u: j in N(u)} sqrt(deg_u)
    # counts item j's same-snapshot contribution mass; degrees are fixed
    # per run so this is computed once
    if cfg.y_trust > 0:
        deg_u = jax.ops.segment_sum(
            jnp.ones_like(user_dev, jnp.float32), user_dev,
            num_segments=train.num_users,
        )
        c = jax.ops.segment_sum(
            jnp.take(jnp.sqrt(deg_u), user_dev), item_dev,
            num_segments=train.num_items,
        )
        y_scale = jnp.minimum(1.0, cfg.y_trust / jnp.maximum(c, 1e-9))
        y_scale = y_scale.astype(model.P.dtype)
    else:
        y_scale = jnp.ones((train.num_items,), model.P.dtype)
    chunks = (
        None if chunk is None
        else _coo_chunks(train, min(chunk, max(1024, train.n_ratings)))
    )
    return user_dev, item_dev, nu, deg_i, y_scale, chunks


def train_epochs_svdpp(
    model: MFModel,
    train: RatingsCOO,
    cfg: SVDPPConfig,
    use_bias: bool,
    seed: int = 0,
    start_epoch: int = 0,
    chunk: int = 1 << 22,
) -> Iterator[tuple[int, MFModel, float]]:
    """Generator yielding ``(epoch, mf_view, train_rmse)``.

    ``model`` is the usual MF init (the driver's); Y starts at zeros so
    epoch 0's minibatch phase is bitwise the plain biased-MF epoch. The
    yielded model is the post-epoch **MF view** ``X = P + S`` with S
    refreshed after the Y step — eval, serving, and checkpoints consume
    it unchanged. Resuming needs the full state (Y): use
    SVDppModel.save_npz / load_npz, not the MF-view checkpoint.
    """
    if start_epoch != 0:
        raise ValueError(
            "svdpp cannot resume from an MF-view checkpoint (the implicit "
            "Y table is not in it); save/restore SVDppModel.save_npz for "
            "warm starts, or rerun from epoch 0"
        )
    user_dev, item_dev, nu, deg_i, y_scale, chunks = svdpp_run_constants(
        model, train, cfg, chunk
    )
    state = SVDppModel(
        P=model.P, Q=model.Q, Y=jnp.zeros_like(model.Q),
        bu=model.bu, bi=model.bi, mu=model.mu, nu=nu,
    )

    sgd_cfg = SGDConfig(
        lr=cfg.lr, reg=cfg.reg, lr_decay=cfg.lr_decay, epochs=cfg.epochs,
        batch_size=cfg.batch_size, partitioner=cfg.partitioner,
        dup_trust=cfg.dup_trust,
    )
    unique_rows = cfg.partitioner == "conflict_free"
    lr_y = cfg.lr if cfg.lr_y is None else cfg.lr_y
    reg_y = cfg.reg if cfg.reg_y is None else cfg.reg_y
    dt = model.P.dtype

    S = implicit_sums(state.Y, user_dev, item_dev, state.nu)  # zeros at init
    for epoch in range(cfg.epochs):
        lr = cfg.lr * (cfg.lr_decay ** epoch)
        plan = plan_epoch(train, sgd_cfg, seed, epoch)
        mf = MFModel(P=state.P + S, Q=state.Q, bu=state.bu, bi=state.bi,
                     mu=state.mu)
        mf, sse = _epoch_scan(
            mf, plan.batches, jnp.asarray(lr, dt), jnp.asarray(cfg.reg, dt),
            use_bias, unique_rows, cfg.dup_trust,
        )
        lr_y_t = lr_y * (cfg.lr_decay ** epoch)  # same decay schedule
        Ynew, _ = y_gradient_step(
            state.Y, mf.P, mf.Q, mf.bu, mf.bi, mf.mu, state.nu, deg_i,
            y_scale, chunks, jnp.asarray(lr_y_t, dt),
            jnp.asarray(reg_y, dt), use_bias=use_bias,
        )
        state = SVDppModel(
            P=mf.P - S, Q=mf.Q, Y=Ynew, bu=mf.bu, bi=mf.bi, mu=mf.mu,
            nu=state.nu,
        )
        # refresh S with the new Y: the next epoch's starting point AND
        # the eval-consistent view of this epoch's model
        S = implicit_sums(state.Y, user_dev, item_dev, state.nu)
        train_rmse = float(jnp.sqrt(sse / max(1, plan.n_real)))
        yield epoch, state.as_mf(S), train_rmse
