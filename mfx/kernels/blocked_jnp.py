"""Pure-XLA mirror of the blocked one-hot SGD kernel (SURVEY.md K4/K2).

Semantically identical to the Pallas kernel in ``sgd_pallas.py`` — same tile
plan, same update order, same segment-sum (one-hotᵀ matmul) gradient
reduction — expressed with ``lax.scan`` + ``dynamic_slice`` so it runs on any
backend. It is the numeric oracle for the Pallas kernel and the CPU
fallback for the 'blocked' partitioner.

Tables must be padded to multiples of (su, si); see pad helpers below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["blocked_epoch_jnp", "pad_tables", "unpad_tables"]


def pad_tables(model, su: int, si: int):
    """Pad P/Q/bu/bi row counts up to multiples of su/si (device-side)."""
    from mfx.models.mf import MFModel

    U, I = model.num_users, model.num_items
    Up = -(-U // su) * su
    Ip = -(-I // si) * si
    pad = lambda x, n: jnp.pad(x, ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))
    return MFModel(
        P=pad(model.P, Up),
        Q=pad(model.Q, Ip),
        bu=pad(model.bu, Up),
        bi=pad(model.bi, Ip),
        mu=model.mu,
    )


def unpad_tables(model, num_users: int, num_items: int):
    from mfx.models.mf import MFModel

    return MFModel(
        P=model.P[:num_users],
        Q=model.Q[:num_items],
        bu=model.bu[:num_users],
        bi=model.bi[:num_items],
        mu=model.mu,
    )


@functools.partial(
    jax.jit, static_argnames=("su", "si", "use_bias", "exact", "lane")
)
def blocked_epoch_jnp(model, tiles, lr, reg, *, su, si, use_bias, exact=True,
                      lane=False):
    """One epoch over a TilePlan's device arrays. Returns (model, sse).

    tiles: dict with ta[NT], tc[NT] int32; tu/ti[NT,T] int32; tr[NT,T] f32.
    Padded slots have tu == su (one-hot row all zero → exact no-op).
    ``exact=True`` uses HIGHEST matmul precision (true f32 one-hot
    gather/scatter); False allows fast bf16-input MXU passes.

    ``lane=True`` mirrors sgd_pallas.py's bias_mode='lane': the model's
    tables must already be in lane-bias form (packing.to_lane_model) and
    ``use_bias`` False — the factor dot carries the biases and the
    constant-1 lanes (P col rank-2, Q col rank-1) are frozen by a static
    delta mask.
    """
    from mfx.models.mf import MFModel

    prec = lax.Precision.HIGHEST if exact else None
    dt = model.P.dtype
    lr = jnp.asarray(lr, dt)
    reg = jnp.asarray(reg, dt)
    T = tiles["tu"].shape[1]
    if lane:
        k = model.P.shape[1]
        col = lax.broadcasted_iota(jnp.int32, (1, k), 1)
        mP = (col != k - 2).astype(dt)
        mQ = (col != k - 1).astype(dt)

    def body(state, tile):
        P, Q, bu, bi = state
        a, c, u, i, r = tile["ta"], tile["tc"], tile["tu"], tile["ti"], tile["tr"]
        Pblk = lax.dynamic_slice(P, (a * su, 0), (su, P.shape[1]))
        Qblk = lax.dynamic_slice(Q, (c * si, 0), (si, Q.shape[1]))
        ou = (u[:, None] == lax.broadcasted_iota(jnp.int32, (T, su), 1)).astype(dt)
        oi = (i[:, None] == lax.broadcasted_iota(jnp.int32, (T, si), 1)).astype(dt)
        pu = jnp.dot(ou, Pblk, precision=prec, preferred_element_type=dt)
        qi = jnp.dot(oi, Qblk, precision=prec, preferred_element_type=dt)
        pred = jnp.sum(pu * qi, axis=-1) + model.mu
        if use_bias:
            bub = lax.dynamic_slice(bu, (a * su,), (su,))
            bib = lax.dynamic_slice(bi, (c * si,), (si,))
            gbu = jnp.dot(ou, bub[:, None], precision=prec, preferred_element_type=dt)[:, 0]
            gbi = jnp.dot(oi, bib[:, None], precision=prec, preferred_element_type=dt)[:, 0]
            pred = pred + gbu + gbi
        e = r - pred  # garbage in padded slots; killed by zero one-hot columns
        mask = (u < su).astype(dt)
        d_pu = lr * (e[:, None] * qi - reg * pu)
        d_qi = lr * (e[:, None] * pu - reg * qi)
        if lane:
            d_pu = d_pu * mP
            d_qi = d_qi * mQ
        dP = jnp.dot(ou.T, d_pu, precision=prec, preferred_element_type=dt)
        dQ = jnp.dot(oi.T, d_qi, precision=prec, preferred_element_type=dt)
        P = lax.dynamic_update_slice(P, Pblk + dP, (a * su, 0))
        Q = lax.dynamic_update_slice(Q, Qblk + dQ, (c * si, 0))
        if use_bias:
            dbu = jnp.dot(
                ou.T, (lr * (e - reg * gbu))[:, None],
                precision=prec, preferred_element_type=dt,
            )[:, 0]
            dbi = jnp.dot(
                oi.T, (lr * (e - reg * gbi))[:, None],
                precision=prec, preferred_element_type=dt,
            )[:, 0]
            bu = lax.dynamic_update_slice(bu, bub + dbu, (a * su,))
            bi = lax.dynamic_update_slice(bi, bib + dbi, (c * si,))
        sse = jnp.sum((e * mask) ** 2)
        return (P, Q, bu, bi), sse

    (P, Q, bu, bi), sses = lax.scan(
        body, (model.P, model.Q, model.bu, model.bi), tiles
    )
    return MFModel(P=P, Q=Q, bu=bu, bi=bi, mu=model.mu), jnp.sum(sses)
