"""ALS solver — SURVEY.md K3: the fallback solver sharing the sparse
pipeline (BASELINE.json north star: "plus an ALS fallback solver sharing
the same sparse pipeline"; configs[3] uses it as a cross-check for
data-parallel SGD).

TPU-native formulation: each half-sweep solves one factor table by batched
rank-k normal equations,

    A_u = Σ_{i∈Ω(u)} q_i q_iᵀ + λ I,   b_u = Σ r_ui q_i,   p_u = A_u⁻¹ b_u

and the Gram accumulation is **degree-bucketed batched matmul**: ratings
are sorted by target row once per run, each row's run is cut into pieces
of at most ``caps[-1]`` ratings, pieces are bucketed by the smallest cap
that fits, and each bucket computes

    A_piece = Q̃ᵀ_piece Q̃_piece      (einsum 'rmd,rme->rde', MXU-batched)

— ~d·8 bytes of HBM per rating (one row gather) instead of the 2·d²·4
bytes/rating a materialized outer-product + segment-sum stream moves
(6.6 TB per 100M-rating half-sweep at rank 128; the bucketed form is
~100x less traffic and keeps the arithmetic on the MXU). Hot rows (degree
beyond the largest cap) split into multiple pieces whose partial Grams
scatter-add exactly. Rows are solved in bounded ranges with a batched
Cholesky (``jax.scipy.linalg.cho_solve``) — no per-row Python.

Biases use the augmented-vector trick: solving for [p_u, bu_u] against
q̃_i = [q_i, 1] makes the bias an extra least-squares coordinate with the
same regularizer — the exact biased-MF objective.

The item half-sweep is the same code with roles swapped (via COO
transposition), so both halves share one implementation and one pipeline.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from mfx.config import ALSConfig
from mfx.data.coo import RatingsCOO
from mfx.models.mf import MFModel

__all__ = [
    "als_half_sweep",
    "train_sweeps_als",
    "build_bucket_plan",
    "bucket_plan_from_row_starts",
    "accumulate_range",
]

# Degree ladder for piece bucketing. caps[-1] also caps the piece length
# (hot rows split; Gram partial sums add exactly).
BUCKET_CAPS = (32, 128, 512, 2048)

# Gather-chunk budget: nb * cap cells per _gram_bucket call. At rank 128
# (d = 129) this is ~140 MB for the (nb, cap, d) gathered-factor block.
BUCKET_CELLS = 1 << 18

# Rows per batched-Cholesky solve, clamped so the (rows, d, d) Gram
# accumulator stays bounded (~70 MB at d = 129).
GRAM_ROWCHUNK_BUDGET = 128 * 1024 * 1024


def _pow2_at_most(n: int, cap: int) -> int:
    n = max(1, min(n, cap))
    return 1 << (n.bit_length() - 1)


def _pow2_at_least(n: int, lo: int = 256) -> int:
    n = int(max(n, lo))  # int(): numpy ints lack bit_length
    return 1 << (n - 1).bit_length()


def gram_rowchunk(d: int, row_chunk: int) -> int:
    return _pow2_at_most(GRAM_ROWCHUNK_BUDGET // (d * d * 4), row_chunk)


def build_bucket_plan(coo_rows_sorted: np.ndarray, num_rows: int):
    """Once per run per side: cut each row's sorted run into pieces and
    bucket by degree. Returns (plan, row_starts) where plan maps
    cap -> (piece_row, piece_start, piece_len), each sorted by row."""
    row_starts = np.searchsorted(
        coo_rows_sorted, np.arange(num_rows + 1, dtype=np.int64)
    )
    return bucket_plan_from_row_starts(row_starts), row_starts


def bucket_plan_from_row_starts(row_starts: np.ndarray):
    """The piece/bucket construction from run boundaries alone — callers
    that already know each row's [start, end) in the sorted rating
    arrays (e.g. the ring planner's device-computed group bounds,
    mfx/parallel/als_ring.py) skip the O(n) host searchsorted."""
    num_rows = len(row_starts) - 1
    degs = np.diff(row_starts)
    capmax = BUCKET_CAPS[-1]
    npieces = -(-degs // capmax)  # 0 pieces for empty rows
    total = int(npieces.sum())
    prow = np.repeat(np.arange(num_rows, dtype=np.int64), npieces)
    first = np.cumsum(npieces) - npieces
    pidx = np.arange(total, dtype=np.int64) - np.repeat(first, npieces)
    pstart = row_starts[prow] + pidx * capmax
    plen = np.minimum(degs[prow] - pidx * capmax, capmax)
    which = np.searchsorted(BUCKET_CAPS, plen)
    plan = {}
    for ci, cap in enumerate(BUCKET_CAPS):
        m = which == ci
        plan[cap] = (
            prow[m].astype(np.int32),
            pstart[m].astype(np.int64),
            plen[m].astype(np.int32),
        )
    return plan


def gram_accumulate(
    F_other,  # (rows_other, k) fixed factors
    b_other,  # (rows_other,)
    mu,
    cols_dev,  # (n,) fixed-side id per rating (sorted by target row)
    vals_dev,  # (n,)
    rows_rel,  # (nb,) int32 range-local target row per piece (pad: nseg-1)
    starts,  # (nb,) int32/int64 piece start in the sorted arrays
    lens,  # (nb,) int32 piece length (pad: 0)
    A,  # (nseg, d, d) accumulator
    b,  # (nseg, d)
    cnt,  # (nseg,)
    *,
    cap: int,
    use_bias: bool,
):
    """Traceable accumulation body shared by the single-chip jit wrapper
    and the data-parallel shard_map body (mfx/parallel/als_dp.py)."""
    nb = rows_rel.shape[0]
    k = F_other.shape[1]
    lane = jnp.arange(cap, dtype=starts.dtype)
    idx = jnp.clip(starts[:, None] + lane[None, :], 0, cols_dev.shape[0] - 1)
    mask = (lane[None, :] < lens[:, None]).astype(F_other.dtype)
    c = jnp.take(cols_dev, idx)  # (nb, cap)
    v = jnp.take(vals_dev, idx)
    q = jnp.take(F_other, c.reshape(-1), axis=0).reshape(nb, cap, k)
    if use_bias:
        q = jnp.concatenate([q, jnp.ones((nb, cap, 1), q.dtype)], axis=2)
        resid = v - mu - jnp.take(b_other, c)
    else:
        resid = v - mu
    qm = q * mask[:, :, None]
    A_p = jnp.einsum(
        "rmd,rme->rde", qm, qm, preferred_element_type=jnp.float32
    )
    b_p = jnp.einsum(
        "rm,rmd->rd", resid * mask, qm, preferred_element_type=jnp.float32
    )
    A = A.at[rows_rel].add(A_p, mode="drop")
    b = b.at[rows_rel].add(b_p, mode="drop")
    cnt = cnt.at[rows_rel].add(lens.astype(cnt.dtype), mode="drop")
    return A, b, cnt


@functools.partial(
    jax.jit, static_argnames=("cap", "nseg", "use_bias")
)
def _gram_bucket(
    F_other, b_other, mu, cols_dev, vals_dev,
    rows_rel, starts, lens, A, b, cnt,
    *, cap: int, nseg: int, use_bias: bool,
):
    del nseg  # carried in A's shape; kept static for cache clarity
    return gram_accumulate(
        F_other, b_other, mu, cols_dev, vals_dev,
        rows_rel, starts, lens, A, b, cnt, cap=cap, use_bias=use_bias,
    )


@functools.partial(jax.jit, static_argnames=("use_bias",))
def _solve_gram(A, b, cnt, old, reg, *, use_bias):
    # Weighted regularization (ALS-WR): λ_row = reg * degree. This is the
    # stationary point of the SGD update p += lr (e·q − reg·p) applied
    # once per rating — i.e. the SAME objective the SGD solver minimizes
    # (per-occurrence L2), which is what makes the configs[3] "ALS
    # cross-check of DP SGD" an apples-to-apples comparison. Flat λ
    # overfits hot rows badly at rank 128 / 100M scale (measured).
    d = A.shape[-1]
    lam = reg * jnp.maximum(cnt, 1.0)
    A = A + lam[:, None, None] * jnp.eye(d, dtype=A.dtype)
    sol = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(A, lower=True), True), b[..., None]
    )[..., 0]
    return jnp.where(cnt[:, None] > 0, sol, old)


def iter_bucket_chunks(buckets, r0: int, r1: int, nseg: int):
    """Yield ``(cap, rows_rel, starts, lens)`` padded piece chunks for
    target rows [r0, r1) — the degree-bucket packing shared by every
    Gram-engine accumulation (ALS/NMF ``accumulate_range``, the iALS
    half-sweeps, and their DP mirrors). Pad slots target the dropped
    segment ``nseg - 1`` with zero length."""
    for cap, (prow, pstart, plen) in buckets.items():
        s, e = np.searchsorted(prow, [r0, r1])
        if e == s:
            continue
        nb_chunk = max(1, BUCKET_CELLS // cap)
        for c0 in range(s, e, nb_chunk):
            c1 = min(c0 + nb_chunk, e)
            nb = _pow2_at_least(c1 - c0)
            rows_rel = np.full(nb, nseg - 1, np.int32)
            starts = np.zeros(nb, pstart.dtype)
            lens = np.zeros(nb, np.int32)
            rows_rel[: c1 - c0] = prow[c0:c1] - r0
            starts[: c1 - c0] = pstart[c0:c1]
            lens[: c1 - c0] = plen[c0:c1]
            yield (
                cap, jnp.asarray(rows_rel), jnp.asarray(starts),
                jnp.asarray(lens),
            )


def accumulate_range(
    F_other, b_other, mu, cols_dev, vals_dev, buckets, r0, r1,
    *, d, dtype, use_bias,
):
    """Normal-equation accumulators (A, b, cnt) for target rows
    [r0, r1) — the degree-bucketed gather/einsum loop shared by the ALS
    Cholesky solve and the NMF multiplicative update
    (mfx/solvers/nmf.py), which differ only in what they do with A, b."""
    nseg = (r1 - r0) + 1  # +1: pad pieces target the dropped last seg
    A = jnp.zeros((nseg, d, d), dtype)
    b = jnp.zeros((nseg, d), dtype)
    cnt = jnp.zeros((nseg,), dtype)
    for cap, rows_rel, starts, lens in iter_bucket_chunks(
        buckets, r0, r1, nseg
    ):
        A, b, cnt = _gram_bucket(
            F_other, b_other, mu, cols_dev, vals_dev,
            rows_rel, starts, lens, A, b, cnt,
            cap=cap, nseg=nseg, use_bias=use_bias,
        )
    return A[: r1 - r0], b[: r1 - r0], cnt[: r1 - r0]


def als_half_sweep(
    F_target,  # (rows, k) table being solved
    b_target,  # (rows,)
    F_other,
    b_other,
    mu,
    coo_rows: np.ndarray,  # target-side id per rating (presorted by this)
    coo_cols: np.ndarray,  # fixed-side id per rating
    coo_vals: np.ndarray,
    reg: float,
    use_bias: bool,
    row_chunk: int = 8192,
    plan=None,
):
    """Solve one table against the other. Ratings must be sorted by
    ``coo_rows`` (caller sorts once per training run); ``plan`` is the
    matching ``build_bucket_plan`` result (built here when absent)."""
    num_rows, k = F_target.shape
    d = k + 1 if use_bias else k
    row_chunk = gram_rowchunk(d, row_chunk)
    if plan is None:
        plan = build_bucket_plan(coo_rows, num_rows)
    buckets, _ = plan
    cols_dev = jnp.asarray(coo_cols)
    vals_dev = jnp.asarray(coo_vals)
    f = F_target.dtype

    new = []
    for r0 in range(0, num_rows, row_chunk):
        r1 = min(r0 + row_chunk, num_rows)
        A, b, cnt = accumulate_range(
            F_other, b_other, mu, cols_dev, vals_dev, buckets, r0, r1,
            d=d, dtype=f, use_bias=use_bias,
        )
        old = (
            jnp.concatenate([F_target[r0:r1], b_target[r0:r1, None]], axis=1)
            if use_bias
            else F_target[r0:r1]
        )
        sol = _solve_gram(
            A, b, cnt, old, jnp.asarray(reg, f), use_bias=use_bias,
        )
        new.append(sol)
    out = jnp.concatenate(new) if len(new) > 1 else new[0]
    if use_bias:
        return out[:, :k], out[:, k]
    return out, b_target


def train_sweeps_als(
    model: MFModel,
    train: RatingsCOO,
    cfg: ALSConfig,
    use_bias: bool = True,
    row_chunk: int | None = None,
) -> Iterator[tuple[int, MFModel]]:
    """Alternate P/Q solves; yields (sweep, model) after each full sweep."""
    row_chunk = row_chunk or cfg.user_chunk
    # sort + bucket once per run: by user for the P-step, by item for the
    # Q-step (degrees don't change across sweeps). The cols/vals arrays
    # go to the device HERE, once — jnp.asarray inside the half-sweep is
    # then a no-op instead of a ~200 MB H2D per half-sweep at 25M scale.
    by_u = np.argsort(train.user, kind="stable")
    u_rows = train.user[by_u]
    u_cols, u_vals = jnp.asarray(train.item[by_u]), jnp.asarray(
        train.rating[by_u])
    by_i = np.argsort(train.item, kind="stable")
    i_rows = train.item[by_i]
    i_cols, i_vals = jnp.asarray(train.user[by_i]), jnp.asarray(
        train.rating[by_i])
    u_plan = build_bucket_plan(u_rows, model.num_users)
    i_plan = build_bucket_plan(i_rows, model.num_items)

    for sweep in range(cfg.sweeps):
        P, bu = als_half_sweep(
            model.P, model.bu, model.Q, model.bi, model.mu,
            u_rows, u_cols, u_vals, cfg.reg, use_bias,
            row_chunk=row_chunk, plan=u_plan,
        )
        model = MFModel(P=P, Q=model.Q, bu=bu, bi=model.bi, mu=model.mu)
        Q, bi = als_half_sweep(
            model.Q, model.bi, model.P, model.bu, model.mu,
            i_rows, i_cols, i_vals, cfg.reg, use_bias,
            row_chunk=row_chunk, plan=i_plan,
        )
        model = MFModel(P=model.P, Q=Q, bu=model.bu, bi=bi, mu=model.mu)
        yield sweep, model
