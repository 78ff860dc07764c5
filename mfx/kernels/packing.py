"""Device-side layout conversion between MFModel and the packed kernel state.

Kernel state (see sgd_pallas.py): one merged array per table,
``(num_blocks * (block/pack + 8), 128)`` f32 — per block: ``block/pack``
rank-packed factor rows followed by 8 bias rows (bias of local row x lives
at row ``x // 128``, lane ``x % 128``; block sizes up to 1024 rows).

All conversions are pure jnp reshape/pad (jittable, cheap on device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mfx.kernels.blocked_host import pack_factor

BIAS_ROWS = 8

__all__ = [
    "pack_state",
    "unpack_state",
    "merged_shape",
    "PackedModel",
    "BIAS_ROWS",
    "to_lane_model",
    "from_lane_model",
]


def _pad_rows(x, rows):
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def merged_shape(num_rows: int, rank: int, block: int) -> tuple[int, int]:
    pack = pack_factor(rank)
    nblocks = -(-num_rows // block)
    return (nblocks * (block // pack + BIAS_ROWS), 128)


def _pack_table(F, b, num_rows: int, rank: int, block: int):
    """(rows, rank) factors + (rows,) bias -> merged (stride*blocks, 128)."""
    pack = pack_factor(rank)
    nb = -(-num_rows // block)
    sup = block // pack
    F = _pad_rows(F.astype(jnp.float32), nb * block).reshape(nb, sup, 128)
    b = _pad_rows(b.astype(jnp.float32)[:, None], nb * block)
    brows = block // 128
    bias = b.reshape(nb, brows, 128)
    bias = jnp.pad(bias, ((0, 0), (0, BIAS_ROWS - brows), (0, 0)))
    return jnp.concatenate([F, bias], axis=1).reshape(nb * (sup + BIAS_ROWS), 128)


def _unpack_table(M, num_rows: int, rank: int, block: int):
    pack = pack_factor(rank)
    nb = -(-num_rows // block)
    sup = block // pack
    brows = block // 128
    M = M.reshape(nb, sup + BIAS_ROWS, 128)
    F = M[:, :sup, :].reshape(nb * block, rank)[:num_rows]
    bias = M[:, sup : sup + brows, :].reshape(nb * block)[:num_rows]
    return F, bias


def pack_state(model, su: int, si: int):
    """MFModel -> (Pm, Qm) merged kernel tables."""
    if su % 128 or si % 128:
        raise ValueError("block sizes must be multiples of 128")
    if su > 128 * BIAS_ROWS or si > 128 * BIAS_ROWS:
        raise ValueError(f"block sizes must be <= {128 * BIAS_ROWS}")
    Pm = _pack_table(model.P, model.bu, model.num_users, model.rank, su)
    Qm = _pack_table(model.Q, model.bi, model.num_items, model.rank, si)
    return Pm, Qm


def unpack_state(Pm, Qm, mu, num_users: int, num_items: int, rank: int, su: int, si: int):
    """(Pm, Qm) -> MFModel with original (unpadded) row counts."""
    from mfx.models.mf import MFModel

    P, bu = _unpack_table(Pm, num_users, rank, su)
    Q, bi = _unpack_table(Qm, num_items, rank, si)
    return MFModel(P=P, Q=Q, bu=bu, bi=bi, mu=jnp.asarray(mu, P.dtype))


def to_lane_model(model):
    """Canonical MFModel -> lane-bias table form (sgd.bias_mode='lane').

    Augmented-vector MF: P rows become [p(rank-2), 1, bu], Q rows
    [q(rank-2), bi, 1], bu/bi zeroed — the factor dot then carries the
    biases, and the kernels run bias-machinery-free with the constant
    lanes frozen by a static delta mask. The two reserved factor columns'
    init values are discarded (lane mode trains rank-2 latent dims);
    ``from_lane_model`` inverts exactly, so checkpoints, eval and serving
    all stay in the canonical representation."""
    import jax.numpy as _jnp

    from mfx.models.mf import MFModel

    r = model.rank
    one = _jnp.ones((), model.P.dtype)
    P = model.P.at[:, r - 2].set(one).at[:, r - 1].set(model.bu)
    Q = model.Q.at[:, r - 2].set(model.bi).at[:, r - 1].set(one)
    z = _jnp.zeros_like(model.bu)
    return MFModel(P=P, Q=Q, bu=z, bi=_jnp.zeros_like(model.bi),
                   mu=model.mu)


def from_lane_model(model):
    """Inverse of ``to_lane_model``: extract bu/bi from the reserved
    lanes and zero them in the factor tables."""
    import jax.numpy as _jnp

    from mfx.models.mf import MFModel

    r = model.rank
    bu = model.P[:, r - 1]
    bi = model.Q[:, r - 2]
    z = _jnp.zeros((), model.P.dtype)
    P = model.P.at[:, r - 2].set(z).at[:, r - 1].set(z)
    Q = model.Q.at[:, r - 2].set(z).at[:, r - 1].set(z)
    return MFModel(P=P, Q=Q, bu=bu, bi=bi, mu=model.mu)


class PackedModel:
    """Lazy MFModel view over the packed kernel state.

    The blocked trainers keep (Pm, Qm) in the merged device layout across
    epochs; unpacking to MFModel costs a device pass over both tables
    (~0.1 s at ML-25M shape), which the hot loop must not pay per epoch.
    Yielding this wrapper defers the unpack until a consumer actually
    touches model attributes (eval, checkpoint) — attribute access
    materializes once and caches.
    """

    def __init__(self, Pm, Qm, mu, num_users, num_items, rank, su, si,
                 lane=False):
        self.Pm = Pm
        self.Qm = Qm
        self._meta = (mu, num_users, num_items, rank, su, si)
        self._model = None
        self._stale = False
        self._lane = lane  # tables in lane-bias form: un-augment on unpack

    def invalidate(self):
        """Called by the yielding trainer when it resumes: the backing
        buffers are donated to the next epoch, so an unmaterialized view
        must fail loudly instead of reading freed memory."""
        self._stale = True
        self.Pm = self.Qm = None  # drop refs so donation can reuse them

    def materialize(self):
        if self._model is None:
            if self._stale:
                raise RuntimeError(
                    "this PackedModel view is stale: the blocked trainer "
                    "donated its backing tables to the next epoch. Use "
                    "each yielded model (or .materialize()) BEFORE "
                    "advancing the generator"
                )
            mu, U, I, rank, su, si = self._meta
            try:
                self._model = unpack_state(
                    self.Pm, self.Qm, mu, U, I, rank, su, si
                )
                if self._lane:
                    self._model = from_lane_model(self._model)
            except RuntimeError as e:  # deleted donated buffers
                raise RuntimeError(
                    "this PackedModel view is stale: the blocked trainer "
                    "donated its backing tables to the next epoch. Use "
                    "each yielded model (or .materialize()) BEFORE "
                    "advancing the generator"
                ) from e
        return self._model

    def block_until_ready(self):
        """Wait for the epoch's device work without forcing an unpack."""
        jax.block_until_ready(self.Qm)
        return self

    @property
    def num_users(self):
        return self._meta[1]

    @property
    def num_items(self):
        return self._meta[2]

    @property
    def rank(self):
        return self._meta[3]

    def __getattr__(self, name):
        # P / Q / bu / bi / mu / predict / astype — forwarded to the
        # materialized MFModel (cached)
        return getattr(self.materialize(), name)


def _packed_flatten(pm: PackedModel):
    m = pm.materialize()
    return (m.P, m.Q, m.bu, m.bi, m.mu), None


def _packed_unflatten(_aux, leaves):
    from mfx.models.mf import MFModel

    return MFModel(*leaves)


# a PackedModel flattens to the materialized MFModel's leaves, so jitted
# consumers (eval, checkpoint state dicts) accept it transparently — the
# unpack happens lazily at first flatten and is cached
jax.tree_util.register_pytree_node(PackedModel, _packed_flatten, _packed_unflatten)


def sweep_arrays(plan) -> dict[str, jax.Array]:
    """SweepPlan -> device arrays for blocked_sgd_sweep_pallas."""
    return {
        "sa": jnp.asarray(plan.sa),
        "tc": jnp.asarray(plan.tc),
        "tl": jnp.asarray(plan.tl),
    }


def q_stride(rank: int, si: int) -> int:
    return si // pack_factor(rank) + BIAS_ROWS


def q_segment(Qm, win0: int, nwin: int, rank: int, si: int):
    """Slice the merged item table to one sweep's windows."""
    s = q_stride(rank, si)
    return Qm[win0 * s : (win0 + nwin) * s]


def q_segment_restore(Qm, Qs, win0: int, rank: int, si: int):
    s = q_stride(rank, si)
    return jax.lax.dynamic_update_slice(Qm, Qs, (win0 * s, 0))


def to_tlane_model(ts_model, n_bins: int):
    """TimeSVDModel -> time-lane MFModel table form (the blocked timeSVD
    path, sgd_pallas time_mode; lane layout in _kernel_body's docstring).

    With L = rank - 3 - n_bins latent dims: P rows become
    [p(L), 0×n_bins, alpha_u, 1, bu], Q rows [q(L), bt_{i,·}, 0, bi, 1].
    The reserved columns' init values are discarded (the time-lane model
    trains L latent dims); ``from_tlane_model`` inverts exactly."""
    import jax.numpy as _jnp

    from mfx.models.mf import MFModel

    r = ts_model.P.shape[1]
    L = r - 3 - n_bins
    if L < 1:
        raise ValueError(
            f"time-lane layout needs rank > n_bins + 3 (rank {r}, "
            f"n_bins {n_bins})"
        )
    dt = ts_model.P.dtype
    one = _jnp.ones((), dt)
    zero = _jnp.zeros((), dt)
    P = ts_model.P
    P = P.at[:, L : L + n_bins].set(zero)
    P = P.at[:, r - 3].set(ts_model.alpha.astype(dt))
    P = P.at[:, r - 2].set(one)
    P = P.at[:, r - 1].set(ts_model.bu.astype(dt))
    Q = ts_model.Q
    Q = Q.at[:, L : L + n_bins].set(ts_model.bt.astype(dt))
    Q = Q.at[:, r - 3].set(zero)
    Q = Q.at[:, r - 2].set(ts_model.bi.astype(dt))
    Q = Q.at[:, r - 1].set(one)
    z_u = _jnp.zeros_like(ts_model.bu)
    z_i = _jnp.zeros_like(ts_model.bi)
    return MFModel(P=P, Q=Q, bu=z_u, bi=z_i, mu=ts_model.mu)


def from_tlane_model(model, n_bins: int):
    """Inverse of ``to_tlane_model``: extract bu/bi/alpha/bt from the
    reserved lanes back into a canonical TimeSVDModel (reserved factor
    columns zeroed, so ``predict_t``'s full-rank dot equals the L-dim
    dot)."""
    import jax.numpy as _jnp

    from mfx.models.timesvd import TimeSVDModel

    r = model.P.shape[1]
    L = r - 3 - n_bins
    z = _jnp.zeros((), model.P.dtype)
    bu = model.P[:, r - 1]
    alpha = model.P[:, r - 3]
    bi = model.Q[:, r - 2]
    bt = model.Q[:, L : L + n_bins]
    P = model.P.at[:, L:].set(z)
    Q = model.Q.at[:, L:].set(z)
    return TimeSVDModel(P=P, Q=Q, bu=bu, bi=bi, mu=model.mu, bt=bt,
                        alpha=alpha)
