"""timeSVD++ trainer (solver='timesvdpp') — temporal dynamics + implicit
feedback on one model.

Koren's timeSVD++ (KDD 2009) — the Netflix-Prize-era flagship of the MF
family — combines the two quality axes this framework already builds:

    r_hat(u,i,t) = mu + b_u + alpha_u*dev_u(t) + b_i + b_{i,Bin(t)}
                      + q_i . (p_u + nu_u * sum_{j in N(u)} y_j)

The TPU-native restructure composes the two solvers' machinery directly:

1. refresh ``S_u = nu_u * sum_j y_j`` once per epoch (one segment_sum —
   mfx/solvers/svdpp.py's epoch-frozen implicit sums);
2. one TEMPORAL SGD epoch over the equivalent timeSVD model with
   ``X = P + S`` (mfx/solvers/timesvd.py's fused scan — d/dp == d/dx, so
   updating X updates P; the bin/drift streams ride the same batches);
3. one exact full-batch gradient step on Y at the epoch-end snapshot
   with the TIME-AWARE residual (the svdpp Y step whose prediction
   carries the temporal biases), trust-capped per item.

With ``lr_y = 0`` the trajectory is bitwise the timesvd trainer's; with
``lr_t = lr_alpha = 0`` it is bitwise the svdpp trainer's (both tested —
the family strictly contains both parents, which in turn contain biased
MF). Needs timestamps (RatingsCOO.timestamp).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Iterator

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from mfx.config import TimeSVDPPConfig
from mfx.data import partition as part
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel
from mfx.models.svdpp import implicit_sums
from mfx.models.timesvd import TimeFeatures, TimeSVDModel, fit_time_features
from mfx.solvers.svdpp import svdpp_run_constants
from mfx.solvers.timesvd import _epoch_scan
from mfx.solvers.sgd import plan_epoch

__all__ = ["train_epochs_timesvdpp", "y_gradient_step_t",
           "y_gradient_step_tiles", "TimeSVDppState"]


@dataclasses.dataclass(frozen=True)
class TimeSVDppState:
    """Full trainer state for warm starts (the TimeSVDModel view alone
    cannot resume — Y would be lost). Host-side container, npz-backed."""

    P: np.ndarray
    Q: np.ndarray
    Y: np.ndarray
    bu: np.ndarray
    bi: np.ndarray
    mu: np.ndarray
    bt: np.ndarray
    alpha: np.ndarray
    nu: np.ndarray

    def save_npz(self, path) -> None:
        np.savez_compressed(
            path, **{f.name: np.asarray(getattr(self, f.name))
                     for f in dataclasses.fields(self)}
        )

    @staticmethod
    def load_npz(path) -> "TimeSVDppState":
        with np.load(path) as z:
            return TimeSVDppState(**{k: z[k] for k in z.files})


@functools.partial(
    jax.jit,
    static_argnames=("su", "si", "tpg", "n_bins", "sweep_meta", "tr_eta"),
)
def y_gradient_step_tiles(
    Y, X, Q, bu, bi, mu, bt, alpha, nu, deg_i, y_scale, sweep_args,
    lr_y, reg_y,
    *, su, si, tpg, n_bins, sweep_meta, tr_eta=None,
):
    """Tile-plan Y step — the K2 one-hot MXU restructure of
    :func:`y_gradient_step_t` (VERDICT r4 #4).

    The chunked form's cost is row GATHERS (X/Q/bt/alpha rows by 5M
    arbitrary indices — the slow op class on TPU) plus scatter-adds.
    This variant replays the SAME blocked tile plan the temporal epoch
    already built (``sweep_args``/``sweep_meta`` from
    plan_temporal_epoch): per tile, rows gather as one-hot MXU matmuls
    against the VMEM/cache-resident (su|si, K) block, and both segment
    reductions are one-hotᵀ matmuls — no per-row gathers or scatters
    anywhere. Two passes:

      pass 1:  A_u  = Σ_{i∈R(u)} e_ui q_i      (per user block)
      pass 2:  G_j  = Σ_{u: j∈N(u)} nu_u A_u   (per item window)

    then the shared trust-capped :func:`~mfx.solvers.svdpp._apply_y_step`.
    Exact up to f32 summation order vs the chunked form (each real
    rating appears exactly once in the plan; pad slots are masked).
    """
    from mfx.solvers.svdpp import Y_TR_ETA, _apply_y_step

    f32 = jnp.float32
    K = X.shape[1]
    iota_su = jnp.arange(su, dtype=jnp.int32)
    iota_si = jnp.arange(si, dtype=jnp.int32)
    iota_nb = jnp.arange(n_bins, dtype=jnp.int32)
    A_blocks = -(-X.shape[0] // su)
    C_wins = -(-Y.shape[0] // si)
    Xp = jnp.zeros((A_blocks * su, K), f32).at[: X.shape[0]].set(X)
    bup = jnp.zeros((A_blocks * su,), f32).at[: bu.shape[0]].set(bu)
    alp = jnp.zeros((A_blocks * su,), f32).at[: alpha.shape[0]].set(alpha)
    nup = jnp.zeros((A_blocks * su,), f32).at[: nu.shape[0]].set(nu)
    Qp = jnp.zeros((C_wins * si, K), f32).at[: Q.shape[0]].set(Q)
    bip = jnp.zeros((C_wins * si,), f32).at[: bi.shape[0]].set(bi)
    btp = jnp.zeros((C_wins * si, n_bins), f32).at[: bt.shape[0]].set(bt)

    def tile_eq(tl_j, tc_j, win0, Ab_or_Cb, mode):
        """Per-tile residual/contrib work shared by both passes.
        mode='resid': returns (dAb, sse) — e·q accumulated per local
        user row. mode='scatter': Ab_or_Cb is the contrib block; returns
        (win_row0, dGw) — w·contrib accumulated per local item row."""
        ul = tl_j[0]
        il = tl_j[1]
        real = (ul < su).astype(f32)
        oh_u = (ul[:, None] == iota_su[None, :]).astype(f32)  # (T, su)
        oh_i = (il[:, None] == iota_si[None, :]).astype(f32)  # (T, si)
        win_row0 = (win0 + tc_j) * si
        if mode == "scatter":
            cr = oh_u @ Ab_or_Cb  # (T, K) contrib rows (nu already in)
            dGw = oh_i.T @ (real[:, None] * cr)
            return win_row0, dGw
        rb = lax.bitcast_convert_type(tl_j[2], f32)
        tb = tl_j[3]
        db = lax.bitcast_convert_type(tl_j[4], f32)
        Xb, bub, alb = Ab_or_Cb
        Qw = lax.dynamic_slice(Qp, (win_row0, 0), (si, K))
        biw = lax.dynamic_slice(bip, (win_row0,), (si,))
        btw = lax.dynamic_slice(btp, (win_row0, 0), (si, n_bins))
        xr = oh_u @ Xb
        qr = oh_i @ Qw
        pred = jnp.sum(xr * qr, axis=1) + mu
        pred = pred + oh_u @ bub + oh_i @ biw
        oh_b = (tb[:, None] == iota_nb[None, :]).astype(f32)
        pred = pred + jnp.sum((oh_i @ btw) * oh_b, axis=1)
        pred = pred + (oh_u @ alb) * db
        e = real * (rb - pred)
        dAb = oh_u.T @ (e[:, None] * qr)
        return dAb, jnp.sum(e * e)

    # ---- pass 1: A per user block, scanning grid groups per sweep ----
    A = jnp.zeros_like(Xp)
    sse = jnp.zeros((), f32)
    for (win0, _nw), arrs in zip(sweep_meta, sweep_args):
        sa = arrs["sa"]
        tl = arrs["tl"]
        tc = arrs["tc"]
        ng = sa.shape[0]
        tlg = tl.reshape(ng, tpg, tl.shape[1], tl.shape[2])
        tcg = tc.reshape(ng, tpg)

        def body1(carry, g):
            A, sse = carry
            sa_g, tl_g, tc_g = g
            r0 = sa_g * su
            Xb = lax.dynamic_slice(Xp, (r0, 0), (su, K))
            bub = lax.dynamic_slice(bup, (r0,), (su,))
            alb = lax.dynamic_slice(alp, (r0,), (su,))
            Ab = lax.dynamic_slice(A, (r0, 0), (su, K))
            for j in range(tpg):
                dAb, sq = tile_eq(tl_g[j], tc_g[j], win0,
                                  (Xb, bub, alb), "resid")
                Ab = Ab + dAb
                sse = sse + sq
            A = lax.dynamic_update_slice(A, Ab, (r0, 0))
            return (A, sse), None

        (A, sse), _ = lax.scan(body1, (A, sse), (sa, tlg, tcg))

    contrib = A * nup[:, None]  # nu_u * A_u

    # ---- pass 2: G per item window, same tile stream ----
    G = jnp.zeros_like(Qp)
    for (win0, _nw), arrs in zip(sweep_meta, sweep_args):
        sa = arrs["sa"]
        tl = arrs["tl"]
        tc = arrs["tc"]
        ng = sa.shape[0]
        tlg = tl.reshape(ng, tpg, tl.shape[1], tl.shape[2])
        tcg = tc.reshape(ng, tpg)

        def body2(G, g):
            sa_g, tl_g, tc_g = g
            Cb = lax.dynamic_slice(contrib, (sa_g * su, 0), (su, K))
            for j in range(tpg):
                w0, dGw = tile_eq(tl_g[j], tc_g[j], win0, Cb, "scatter")
                Gw = lax.dynamic_slice(G, (w0, 0), (si, K))
                G = lax.dynamic_update_slice(G, Gw + dGw, (w0, 0))
            return G, None

        G, _ = lax.scan(body2, G, (sa, tlg, tcg))

    G = G[: Y.shape[0]]
    eta = Y_TR_ETA if tr_eta is None else tr_eta
    Ynew = _apply_y_step(Y, y_scale[:, None] * G, deg_i, lr_y, reg_y, eta)
    return Ynew, sse


@functools.partial(jax.jit, static_argnames=("tr_eta",))
def y_gradient_step_t(
    Y, X, Q, bu, bi, mu, bt, alpha, nu, deg_i, y_scale, batches, lr_y,
    reg_y, tr_eta=None,
):
    """One full-batch gradient step on Y at frozen (X, Q, biases, bt,
    alpha) with the TIME-AWARE residual — the temporal generalization of
    mfx.solvers.svdpp.y_gradient_step (same two streaming passes; the
    chunk tensors additionally carry tbins/devs). Exact gradient with
    all-ones ``y_scale`` (tested vs jax.grad); the trainer passes the
    ``min(1, y_trust / c_j)`` hot-item trust cap."""
    num_users = X.shape[0]
    n_bins = bt.shape[-1]
    bt_flat = bt.reshape(-1)

    def resid_body(A, b):
        pu = jnp.take(X, b["users"], axis=0, mode="clip")
        qi = jnp.take(Q, b["items"], axis=0, mode="clip")
        pred = jnp.sum(pu * qi, axis=-1) + mu
        pred = pred + jnp.take(bu, b["users"], mode="clip")
        pred = pred + jnp.take(bi, b["items"], mode="clip")
        flat = b["items"] * n_bins + b["tbins"]
        pred = pred + jnp.take(bt_flat, flat, mode="clip")
        pred = pred + jnp.take(alpha, b["users"], mode="clip") * b["devs"]
        e = (b["ratings"] - pred) * b["weights"]
        A = A + jax.ops.segment_sum(
            e[:, None] * qi, b["users"], num_segments=num_users,
            indices_are_sorted=False, unique_indices=False,
        )
        return A, jnp.sum(e * e)

    A0 = jnp.zeros_like(X)
    A, sqs = jax.lax.scan(resid_body, A0, batches)
    contrib_u = A * nu[:, None]

    def scatter_body(G, b):
        c = jnp.take(contrib_u, b["users"], axis=0, mode="clip")
        c = c * b["weights"][:, None]
        G = G.at[b["items"]].add(c, mode="drop")
        return G, None

    G, _ = jax.lax.scan(scatter_body, jnp.zeros_like(Y), batches)
    from mfx.solvers.svdpp import Y_TR_ETA, _apply_y_step

    # production stabilization (see svdpp._apply_y_step: exact
    # sequential L2 shrink + trust-region pull clip — the linear
    # full-batch step diverges at Zipf scale); tr_eta=0 keeps the
    # exact-gradient contract
    eta = Y_TR_ETA if tr_eta is None else tr_eta
    Ynew = _apply_y_step(Y, y_scale[:, None] * G, deg_i, lr_y, reg_y, eta)
    return Ynew, jnp.sum(sqs)


def _coo_chunks_t(
    train: RatingsCOO, chunk: int, tbins: np.ndarray, devs: np.ndarray
) -> dict[str, jax.Array]:
    """The whole COO + time features as padded [nc, C] chunk tensors."""
    order = np.arange(train.n_ratings, dtype=np.int64)
    arrays = part.pad_to_batches(
        train.user, train.item, train.rating, order, chunk,
        num_users=train.num_users, num_items=train.num_items,
        extras={"tbins": tbins, "devs": devs},
    )
    return {k: jnp.asarray(v) for k, v in arrays.items()}


def train_epochs_timesvdpp(
    model: MFModel,
    train: RatingsCOO,
    cfg: TimeSVDPPConfig,
    use_bias: bool = True,
    seed: int = 0,
    start_epoch: int = 0,
    feats: TimeFeatures | None = None,
    chunk: int = 1 << 22,
    init_state: TimeSVDppState | None = None,
    capture: dict | None = None,
) -> Iterator[tuple[int, TimeSVDModel, float]]:
    """Generator yielding ``(epoch, timesvd_view, train_rmse)``.

    The yielded model is the post-epoch TimeSVDModel view over
    ``X = P + S`` (S refreshed after the Y step) — the driver's
    time-aware eval and ``as_mf`` serving consume it exactly like the
    plain timesvd solver's output.

    Warm starts: pass ``capture={}`` and the trainer updates
    ``capture['state']`` with the full post-epoch :class:`TimeSVDppState`
    each epoch (persist via ``save_npz``); restart with
    ``init_state=TimeSVDppState.load_npz(...)`` and the matching
    ``start_epoch`` to continue the exact trajectory (tested bitwise).
    The MF-view checkpoint alone cannot resume (Y/bt/alpha are not in
    it)."""
    if not use_bias:
        raise ValueError(
            "solver='timesvdpp' is the temporal+implicit extension of "
            "BIASED MF; set model.use_bias=true"
        )
    if start_epoch != 0 and init_state is None:
        raise ValueError(
            "timesvdpp cannot resume from a view checkpoint (Y/bt/alpha "
            "are not all in it); restart from epoch 0, or pass "
            "init_state=TimeSVDppState (persisted via capture + save_npz)"
        )
    if feats is None:
        feats = fit_time_features(train, n_bins=cfg.n_bins, beta=cfg.beta)
    tbins, devs = feats.features(train.user, train.timestamp)
    extras = {"tbins": tbins, "devs": devs}
    user_dev, item_dev, nu, deg_i, y_scale, _ = svdpp_run_constants(
        model, train, cfg, chunk=None  # chunks built below with extras
    )
    chunks = None  # jnp-path padded chunk tensors, built lazily below
    # (the blocked path's Y step replays the tile plan instead — the
    # ~3n-float chunk tensors would be dead device memory there)

    f32 = model.P.dtype
    if init_state is not None:
        if init_state.bt.shape[1] != feats.n_bins:
            raise ValueError(
                f"init_state has {init_state.bt.shape[1]} time bins; this "
                f"run's featurizer has {feats.n_bins} (timesvdpp.n_bins)"
            )
        P = jnp.asarray(init_state.P, f32)
        Q = jnp.asarray(init_state.Q, f32)
        Y = jnp.asarray(init_state.Y, f32)
        bu = jnp.asarray(init_state.bu, f32)
        bi = jnp.asarray(init_state.bi, f32)
        mu = jnp.asarray(init_state.mu, f32)
        bt = jnp.asarray(init_state.bt, f32)
        alpha = jnp.asarray(init_state.alpha, f32)
    else:
        Y = jnp.zeros_like(model.Q)
        P, Q = model.P, model.Q
        bu, bi, mu = model.bu, model.bi, model.mu
        bt = jnp.zeros((model.num_items, feats.n_bins), f32)
        alpha = jnp.zeros((model.num_users,), f32)

    lr_t0 = cfg.lr if cfg.lr_t is None else cfg.lr_t
    lr_a0 = cfg.lr if cfg.lr_alpha is None else cfg.lr_alpha
    reg_t = cfg.reg if cfg.reg_t is None else cfg.reg_t
    reg_a = 10.0 * cfg.reg if cfg.reg_alpha is None else cfg.reg_alpha
    lr_y0 = cfg.lr if cfg.lr_y is None else cfg.lr_y
    reg_y = cfg.reg if cfg.reg_y is None else cfg.reg_y
    unique_rows = cfg.partitioner == "conflict_free"

    blocked = getattr(cfg, "kernel", "jnp") == "pallas"
    if not blocked:
        chunks = _coo_chunks_t(
            train, min(chunk, max(1024, train.n_ratings)), tbins, devs
        )
    if blocked:
        # the temporal epoch rides the fused blocked kernel
        # (mfx/solvers/timesvd_blocked.py): lane-carried bin/drift, one
        # lr/reg for all SGD terms (validated), plan reused across
        # epochs like the blocked trainers
        from mfx.solvers.blocked import sweep_geometry
        from mfx.solvers.timesvd_blocked import (
            _require_uniform_schedule, plan_temporal_epoch,
            run_temporal_epoch,
        )

        _require_uniform_schedule(cfg)
        rank = model.rank
        if 128 % rank:
            raise ValueError(
                f"timesvdpp.kernel='pallas' needs rank dividing 128, "
                f"got {rank}"
            )
        nb_eff = cfg.n_bins if feats is None else feats.n_bins
        if nb_eff > rank - 4:
            raise ValueError(
                f"timesvdpp.kernel='pallas' carries the {nb_eff} bin "
                f"biases in the factor lanes: needs n_bins <= rank-4 = "
                f"{rank - 4}"
            )
        b_su = b_si = 512
        b_tile, b_tpg = 256, 4
        b_nwin = sweep_geometry(model.num_items, rank, b_si)
        b_interp = jax.default_backend() != "tpu"
        b_plan = None

    S = implicit_sums(Y, user_dev, item_dev, nu)  # zeros at init
    for epoch in range(start_epoch, cfg.epochs):
        decay = cfg.lr_decay**epoch
        ts = TimeSVDModel(P=P + S, Q=Q, bu=bu, bi=bi, mu=mu, bt=bt,
                          alpha=alpha)
        if blocked:
            if b_plan is None:
                # the plan is pinned to epoch id 0 REGARDLESS of
                # start_epoch, so a warm start resumes the exact
                # trajectory of the continuous run (which reuses this
                # same plan every epoch — stratified order re-randomizes
                # within strata, as in the other blocked trainers)
                b_plan = plan_temporal_epoch(
                    train, tbins, devs, su=b_su, si=b_si, tile=b_tile,
                    tpg=b_tpg, nwin=b_nwin, seed=seed, epoch=0,
                )
            ts, sse = run_temporal_epoch(
                ts, b_plan[0], b_plan[1],
                cfg.lr * decay, cfg.reg, feats.n_bins,
                su=b_su, si=b_si, tpg=b_tpg,
                interpret=b_interp,
            )
        else:
            plan = plan_epoch(train, cfg, seed, epoch, extras=extras)
            ts, sse = _epoch_scan(
                ts, plan.batches,
                jnp.asarray(cfg.lr * decay, f32),
                jnp.asarray(lr_t0 * decay, f32),
                jnp.asarray(lr_a0 * decay, f32),
                jnp.asarray(cfg.reg, f32),
                jnp.asarray(reg_t, f32),
                jnp.asarray(reg_a, f32),
                unique_rows, cfg.dup_trust,
            )
        if blocked:
            # the tile-plan one-hot Y step replays the SAME plan the
            # temporal epoch just ran — no per-row gathers/scatters
            # (chunked form: ~0.83 s at 5M on chip, ~74% of the epoch;
            # see y_gradient_step_tiles)
            Y, _ = y_gradient_step_tiles(
                Y, ts.P, ts.Q, ts.bu, ts.bi, ts.mu, ts.bt, ts.alpha,
                nu, deg_i, y_scale, tuple(b_plan[0]),
                jnp.asarray(lr_y0 * decay, f32), jnp.asarray(reg_y, f32),
                su=b_su, si=b_si, tpg=b_tpg, n_bins=feats.n_bins,
                sweep_meta=tuple(b_plan[1]),
            )
        else:
            Y, _ = y_gradient_step_t(
                Y, ts.P, ts.Q, ts.bu, ts.bi, ts.mu, ts.bt, ts.alpha,
                nu, deg_i, y_scale, chunks,
                jnp.asarray(lr_y0 * decay, f32), jnp.asarray(reg_y, f32),
            )
        P, Q = ts.P - S, ts.Q
        bu, bi, bt, alpha = ts.bu, ts.bi, ts.bt, ts.alpha
        # refresh S with the new Y: the next epoch's starting point AND
        # the eval-consistent view of this epoch's model
        S = implicit_sums(Y, user_dev, item_dev, nu)
        n_real = train.n_ratings if blocked else plan.n_real
        train_rmse = float(jnp.sqrt(sse / max(1, n_real)))
        if capture is not None:
            capture["state"] = TimeSVDppState(
                P=np.asarray(P), Q=np.asarray(Q), Y=np.asarray(Y),
                bu=np.asarray(bu), bi=np.asarray(bi), mu=np.asarray(mu),
                bt=np.asarray(bt), alpha=np.asarray(alpha),
                nu=np.asarray(nu),
            )
        yield epoch, TimeSVDModel(
            P=P + S, Q=Q, bu=bu, bi=bi, mu=mu, bt=bt, alpha=alpha
        ), train_rmse
