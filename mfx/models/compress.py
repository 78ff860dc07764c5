"""Rank compression — distill a factor model to a smaller rank with the
provably-optimal truncation (SURVEY.md M-family companion; the reference
snapshot ships no code — /root/reference/README.md:1-2).

The interaction part of an MF model is the rank-r matrix ``P·Qᵀ``. Its
best rank-k approximation (Frobenius; Eckart–Young) is its truncated
SVD — computable WITHOUT materializing the (U, I) score matrix:

    P = Up·Rp   (reduced QR, U×r)
    Q = Uq·Rq   (reduced QR, I×r)
    Rp·Rqᵀ = W·S·Vᵀ   (an r×r SVD — tiny)
    P' = Up·W[:, :k]·√S[:k],   Q' = Uq·V[:, :k]·√S[:k]

Two tall-skinny QRs + one r×r SVD: O((U+I)·r²) device work, exact.
Biases and mu pass through untouched (they are rank-independent).

Why it exists: serving capacity/latency scales with rank — a blended
model's rank is the SUM of its members' (mfx/models/ensemble.py), and
this is the inverse lever: blend for quality, compress for serving.
The singular-value spectrum tells you what a rank budget costs
(``CompressResult.energy`` = retained fraction of ‖P·Qᵀ‖²_F).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from mfx.models.mf import MFModel

__all__ = ["CompressResult", "compress_model"]


@dataclasses.dataclass(frozen=True)
class CompressResult:
    model: MFModel
    singular_values: np.ndarray  # (r,) full spectrum of P·Qᵀ
    energy: float                # ‖kept‖²_F / ‖all‖²_F in [0, 1]


def compress_model(model: MFModel, rank: int) -> CompressResult:
    """Truncate ``model`` to ``rank`` latent dims, optimally (docstring
    above). ``rank == model.rank`` re-parametrizes losslessly (the
    returned factors are the SVD-aligned basis, predictions equal to
    f32 tolerance)."""
    r = model.rank
    if not 1 <= rank <= r:
        raise ValueError(f"rank must be in [1, {r}], got {rank}")
    f = jnp.float32  # QR/SVD in f32 even for bf16-stored tables
    Up, Rp = jnp.linalg.qr(model.P.astype(f), mode="reduced")
    Uq, Rq = jnp.linalg.qr(model.Q.astype(f), mode="reduced")
    W, S, Vt = jnp.linalg.svd(Rp @ Rq.T)
    root = jnp.sqrt(S[:rank])
    P = (Up @ W[:, :rank]) * root[None, :]
    Q = (Uq @ Vt[:rank, :].T) * root[None, :]
    s = np.asarray(S, np.float64)
    total = float((s**2).sum())
    energy = 1.0 if total == 0.0 else float((s[:rank] ** 2).sum()) / total
    out = MFModel(
        P=P.astype(model.P.dtype), Q=Q.astype(model.Q.dtype),
        bu=model.bu, bi=model.bi, mu=model.mu,
    )
    return CompressResult(
        model=out, singular_values=np.asarray(S), energy=energy
    )
