"""Fused serving selection kernel — score-block-free top-K candidates.

The stock serving path (mfx/serve/topk.py) materializes a
``(batch, catalog)`` f32 score block in HBM per dispatch and reduces it
with ``top_k`` / ``approx_max_k``: at a 1M-item catalog that block is
~1 GB — 4x the f32 factor table itself — and the measured latency is
bound by writing + re-reading it, not by the table stream (docs/
SERVING.md "latency notes"). This kernel removes the block entirely:

  grid over catalog tiles; per step one MXU matmul
  ``P_aug (B, 128) @ Q_aug_tile (tile, 128)^T`` scores the tile IN VMEM,
  and only each tile's TOP-2 (value, lane) survive to HBM — the kernel's
  whole output is four ``(B, n_tiles)`` arrays (~100x smaller than the
  score block).

The bias trick keeps the kernel bias-aware with zero extra streams:
``P_aug = [p, 1, 0...]``, ``Q_aug = [q, b_i, 0...]`` so the matmul carries
``p·q + b_i``; ``b_u + mu`` are per-ROW constants that cannot change a
row's ranking and are added at finalize (mfx/serve/fused.py). Catalog pad
rows carry ``b_i = -1e30`` and never win a tile.

Top-2 per tile (not top-1) is what makes the downstream exclusion and
final top-K accurate: a seen item that wins its tile falls back to the
tile's runner-up, and two top-K items sharing a tile both surface. The
recall contract vs exact serving is pinned in tests
(tests/unit/test_fused_serve.py) and measured on chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["tile_topk", "tile_topk2", "AUG_LANES"]

AUG_LANES = 128  # P_aug/Q_aug lane width: rank + bias lane, zero-padded


def _kernel(tn, depth, quant, p_ref, q_ref, *refs):
    # 2-D grid (groups, 128): step (g, tl) scores catalog tile
    # t = g*128 + tl. The output block (B, 128) is indexed by g alone, so
    # it stays VMEM-resident across the 128 inner steps while each step
    # masked-writes its own lane column (Mosaic cannot store at a dynamic
    # lane offset, and a full-width resident output block measured 5x
    # slower — the RMW traffic scales with the block width).
    if quant:
        sb_ref, *out_refs = refs
    else:
        out_refs = refs
    tl = pl.program_id(1)
    t = pl.program_id(0) * 128 + tl

    @pl.when(t < tn)
    def _():
        p = p_ref[:]
        if quant:
            # int8 catalog: the tile converts to f32 in VMEM and the
            # per-item dequant scale applies to the SCORE columns
            # (column-scaling the (B, tile) scores ≡ row-scaling the
            # (tile, lanes) q, and stays 2-D for Mosaic); the item bias
            # adds to the scores — it cannot ride an int8 lane, so it
            # streams in sb instead of the augmented lane the f32/bf16
            # path uses. The catalog stream is a QUARTER of f32's
            # bytes; the convert+scale is ~tile·lanes VPU ops against a
            # kernel that is already VPU/grid-bound.
            q = q_ref[:].astype(jnp.float32)
        else:
            q = q_ref[:]
        scores = jax.lax.dot_general(
            p, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # HIGHEST: true-f32 scoring. Default-precision f32 matmuls
            # round inputs to bf16 on TPU (chip-observed ~1e-2-class
            # score deltas at |score|~6 vs a HIGHEST-precision XLA
            # rescore), which would break the exact mode's suspect-tile
            # bound (a rounded bound can sit below an item's true f32
            # score) and churn near-tie rankings. f32 costs ~1.14x bf16
            # on this MXU and the kernel is VPU/grid-bound.
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, tile)
        if quant:
            scores = scores * sb_ref[0, 0:1, :] + sb_ref[0, 1:2, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        big = jnp.int32(scores.shape[1])
        hit = jax.lax.broadcasted_iota(
            jnp.int32, out_refs[0].shape, 1
        ) == tl
        # iterative max-extract: each round finds the running maximum
        # (first lane on ties), records it, masks it out — ``depth``
        # rounds of VPU reduce+select against the VMEM-resident tile
        for j in range(depth):
            m = jnp.max(scores, axis=1, keepdims=True)  # (B, 1)
            a = jnp.min(
                jnp.where(scores >= m, lane, big), axis=1, keepdims=True
            )
            out_refs[2 * j][:] = jnp.where(hit, m, out_refs[2 * j][:])
            out_refs[2 * j + 1][:] = jnp.where(
                hit, a, out_refs[2 * j + 1][:]
            )
            if j + 1 < depth:
                scores = jnp.where(lane == a, -jnp.inf, scores)


@functools.partial(
    jax.jit, static_argnames=("tile", "depth", "interpret")
)
def tile_topk(P_aug, Q_aug, tile: int = 1024, depth: int = 2,
              interpret: bool = False, sb=None):
    """Per-tile top-``depth`` candidates of ``P_aug @ Q_augᵀ``.

    P_aug: (B, 128) — factor rows with the bias-carry lane ([p, 1, 0…]).
    Q_aug: (I_pad, 128) — catalog, I_pad a multiple of ``tile``, pad rows
           with bias lane -1e30 ([q, b_i, 0…]).
    Returns ``depth`` pairs ``(m_j, a_j)``, each (B, n_tiles): the
    tile's j-th best score and its LOCAL lane id (global item =
    t*tile + lane), j in rank order. Dtypes: scores f32 (f32 MXU
    accumulation even for bf16 tables).

    int8 catalogs (the serving CAPACITY lever, 4x less HBM than f32):
    pass ``Q_aug`` as int8 rows (bias lane 0) plus ``sb``, an
    (n_tiles, 2, tile) f32 stream with row 0 the per-item dequant scale
    and row 1 the item bias (pad items: scale 0, bias -1e30). The
    kernel dequantizes each tile in VMEM and adds the bias to the
    scores, so selection quality matches the stock int8 scorer while
    the catalog stream is a quarter of f32's.

    ``depth`` trades VPU work for pool quality: each extra rank is one
    more max-extract round against the VMEM-resident tile. depth=2 is
    the latency-optimal serving default; the certified-exact mode uses
    deeper selection so that "≥depth+1 of a user's top-K collide in one
    tile" — the only event that makes a tile suspect — becomes rare
    (mfx/serve/fused.py)."""
    B = P_aug.shape[0]
    ipad, lanes = Q_aug.shape
    if lanes != AUG_LANES or P_aug.shape[1] != AUG_LANES:
        raise ValueError(f"augmented tables must have {AUG_LANES} lanes")
    if ipad % tile != 0:
        raise ValueError(f"catalog pad {ipad} not a multiple of tile {tile}")
    if not 1 <= depth <= tile:
        raise ValueError(f"depth must be in [1, tile={tile}], got {depth}")
    quant = Q_aug.dtype == jnp.int8
    if quant and (sb is None or sb.shape != (ipad // tile, 2, tile)):
        raise ValueError(
            "int8 Q_aug needs sb=(n_tiles, 2, tile) f32 scales+biases"
        )
    if not quant and sb is not None:
        raise ValueError("sb is only for int8 catalogs")
    tn = ipad // tile
    # lane-pad the (B, tn) outputs to the vreg width; callers slice [:tn]
    tn_hi = -(-tn // 128)
    tn_pad = tn_hi * 128

    def q_map(g, tl):
        return (jnp.minimum(g * 128 + tl, tn - 1), 0)

    in_specs = [
        pl.BlockSpec((B, AUG_LANES), lambda g, tl: (0, 0)),
        pl.BlockSpec((tile, AUG_LANES), q_map),
    ]
    operands = [P_aug, Q_aug]
    if quant:
        in_specs.append(
            pl.BlockSpec((1, 2, tile), lambda g, tl: (q_map(g, tl)[0], 0, 0))
        )
        operands.append(sb)
    out = pl.pallas_call(
        functools.partial(_kernel, tn, depth, quant),
        grid=(tn_hi, 128),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((B, 128), lambda g, tl: (0, g))
            for _ in range(2 * depth)
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (B, tn_pad), jnp.float32 if j % 2 == 0 else jnp.int32
            )
            for j in range(2 * depth)
        ],
        interpret=interpret,
    )(*operands)
    return tuple(o[:, :tn] for o in out)


def tile_topk2(P_aug, Q_aug, tile: int = 1024, interpret: bool = False):
    """Per-tile top-2 (the serving default) — see :func:`tile_topk`."""
    return tile_topk(P_aug, Q_aug, tile=tile, depth=2, interpret=interpret)
