"""Fused BPR Pallas kernel — K1's one-hot MXU scheme for pairwise
ranking triples (BASELINE.json configs[4]: billion-rating implicit
feedback; SURVEY.md M3/K1).

Round 3's sharded BPR rode the XLA gather/scatter minibatch path (the
0.014e9-class baseline). This kernel runs the DSGD-ring sub-step through
the same machinery as the explicit-SGD kernel (mfx/kernels/sgd_pallas.py):
tiles of T triples stratified by (user block, positive-item window), row
access as block-local one-hot matmuls, sequential grid = deterministic.
Per tile:

    pu, qi, qj = onehot gathers (3 MXU matmuls)
    x  = pu . (qi - qj)
    e  = sigmoid(-x)                      # d(-ln sigma(x))/dx
    P  += ouT @ lr (e (qi - qj) - reg pu) # one-hotT = exact segment-sum
    Q[i] += oiT @ lr (e pu - reg qi)
    Q[j] += ojT @ lr (-e pu - reg qj)

Negatives are drawn (exactly, with device-side rejection) from the
POSITIVE'S ITEM WINDOW — a per-run-shuffled ~si-item random catalog
subset (mfx/parallel/bpr_sharded.py draws from the whole held block; the
window restriction is what keeps qj's one-hot the same (T, sip) shape as
qi's). Restricted negative pools are standard for ranking losses
(in-batch negatives use far fewer candidates); sampled-AUC quality is
asserted in tests/distributed/test_bpr_parallel.py.

Pad slots carry id == su/si sentinels: zero one-hot rows make them exact
no-ops, and the loss masks them. Biases are out of scope (BPR trains
factors only; the merged layout's bias rows ride along untouched).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfx.kernels.sgd_pallas import BIAS_ROWS, TILE_CHUNK

__all__ = ["bpr_sweep_pallas"]


def _kernel_body(su, si, rank, pack, tile, tpg, nwin, exact):
    sup, sip = su // pack, si // pack
    qstride = sip + BIAS_ROWS
    prec = lax.Precision.HIGHEST if exact else None
    f32 = jnp.float32
    T = tile

    def dot(x, y):
        return jnp.dot(x, y, precision=prec, preferred_element_type=f32)

    def dot_t(x, y):  # xT @ y without materializing the transpose
        return lax.dot_general(
            x, y, (((0,), (0,)), ((), ())),
            precision=prec, preferred_element_type=f32,
        )

    def kernel(
        hp_ref, sa_ref, tc_ref,  # scalar prefetch: f32[2], i32[NG], i32[NT]
        tl_ref,  # (tpg, 3, T): rows = (u_local, i_winlocal, j_winlocal)
        P_in, Q_in,
        P_out, Q_hbm, loss_ref,
        Qseg, acc_ref, sem,
    ):
        del Q_in
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        lr = hp_ref[0]
        reg = hp_ref[1]

        @pl.when(g == 0)
        def _():
            acc_ref[0] = 0.0
            cp = pltpu.make_async_copy(
                Q_hbm.at[pl.ds(0, nwin * qstride), :], Qseg, sem
            )
            cp.start()
            cp.wait()

        prev_g = jnp.maximum(g - 1, 0)

        @pl.when(jnp.logical_or(g == 0, sa_ref[g] != sa_ref[prev_g]))
        def _():
            P_out[:, :] = P_in[:, :]

        loss = jnp.zeros((), f32)
        for t in range(tpg):  # static unroll: tpg tiles per grid step
            c = tc_ref[g * tpg + t]
            qs = c * qstride

            u = tl_ref[t, 0, :]  # pad sentinel == su
            i = tl_ref[t, 1, :]  # window-local; pad sentinel == si
            j = tl_ref[t, 2, :]

            up = u // pack
            ip = i // pack
            jp = j // pack
            ou = (
                up[:, None] == lax.broadcasted_iota(jnp.int32, (T, sup), 1)
            ).astype(f32)
            oi = (
                ip[:, None] == lax.broadcasted_iota(jnp.int32, (T, sip), 1)
            ).astype(f32)
            oj = (
                jp[:, None] == lax.broadcasted_iota(jnp.int32, (T, sip), 1)
            ).astype(f32)

            gu = dot(ou, P_out[:sup, :])
            gi = dot(oi, Qseg[pl.ds(qs, sip), :])
            gj = dot(oj, Qseg[pl.ds(qs, sip), :])
            if pack > 1:
                sou = (
                    (u % pack)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, pack), 1)
                ).astype(f32)
                soi = (
                    (i % pack)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, pack), 1)
                ).astype(f32)
                soj = (
                    (j % pack)[:, None]
                    == lax.broadcasted_iota(jnp.int32, (T, pack), 1)
                ).astype(f32)
                pu = sou[:, 0:1] * gu[:, :rank]
                qi = soi[:, 0:1] * gi[:, :rank]
                qj = soj[:, 0:1] * gj[:, :rank]
                for s in range(1, pack):
                    pu = pu + sou[:, s : s + 1] * gu[:, s * rank : (s + 1) * rank]
                    qi = qi + soi[:, s : s + 1] * gi[:, s * rank : (s + 1) * rank]
                    qj = qj + soj[:, s : s + 1] * gj[:, s * rank : (s + 1) * rank]
            else:
                pu, qi, qj = gu, gi, gj

            diff = qi - qj
            x = jnp.sum(pu * diff, axis=-1)
            mask = (u < su).astype(f32)
            e = jax.nn.sigmoid(-x)  # pads killed by zero one-hots below

            d_pu = lr * (e[:, None] * diff - reg * pu)
            d_qi = lr * (e[:, None] * pu - reg * qi)
            d_qj = lr * (-e[:, None] * pu - reg * qj)
            if pack > 1:
                d_pu128 = jnp.concatenate(
                    [d_pu * sou[:, s : s + 1] for s in range(pack)], axis=1
                )
                d_qi128 = jnp.concatenate(
                    [d_qi * soi[:, s : s + 1] for s in range(pack)], axis=1
                )
                d_qj128 = jnp.concatenate(
                    [d_qj * soj[:, s : s + 1] for s in range(pack)], axis=1
                )
            else:
                d_pu128, d_qi128, d_qj128 = d_pu, d_qi, d_qj
            P_out[:sup, :] = P_out[:sup, :] + dot_t(ou, d_pu128)
            # two sequential scatters into the same window: the second
            # reads the first's result, preserving the jnp path's ordered
            # .at[pos].add -> .at[neg].add semantics deterministically
            Qseg[pl.ds(qs, sip), :] = Qseg[pl.ds(qs, sip), :] + dot_t(
                oi, d_qi128
            )
            Qseg[pl.ds(qs, sip), :] = Qseg[pl.ds(qs, sip), :] + dot_t(
                oj, d_qj128
            )

            # the [None, :] reshape is load-bearing: Mosaic crashes
            # (compile-helper exit 1) reducing a 1-D vector that itself
            # came off a 2-D axis-reduction; reduce in 2-D instead
            loss = loss + jnp.sum(
                (-jnp.log(jax.nn.sigmoid(x) + 1e-12) * mask)[None, :]
            )

        acc_ref[0] = acc_ref[0] + loss

        @pl.when(g == ng - 1)
        def _():
            cp = pltpu.make_async_copy(
                Qseg, Q_hbm.at[pl.ds(0, nwin * qstride), :], sem
            )
            cp.start()
            cp.wait()
            loss_ref[:, :] = acc_ref[0][None, None]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("su", "si", "rank", "tpg", "exact", "interpret"),
)
def bpr_sweep_pallas(
    Pm: jax.Array,  # (A*(su/pack+8), 128) f32 merged user table
    Qs: jax.Array,  # (nwin*(si/pack+8), 128) f32 merged item segment
    sweep: dict[str, jax.Array],  # sa (NG,); tc (NT,); tl (NT, 3, T)
    lr,
    reg,
    *,
    su: int,
    si: int,
    rank: int,
    tpg: int = 4,
    exact: bool = False,
    interpret: bool = False,
):
    """One sweep of fused BPR over a tile stream. Returns (Pm, Qs, loss).
    Chunked like the SGD kernel to bound SMEM prefetch."""
    nt = sweep["tc"].shape[0]
    ng = sweep["sa"].shape[0]
    if nt != ng * tpg:
        raise ValueError(f"tc length {nt} != sa length {ng} * tpg {tpg}")
    pack = 128 // rank
    nwin = Qs.shape[0] // (si // pack + BIAS_ROWS)
    f32 = jnp.float32
    loss = jnp.zeros((1, 1), f32)
    step = (TILE_CHUNK // tpg) * tpg
    for off in range(0, nt, step):
        chunk = {
            "sa": sweep["sa"][off // tpg : (off + step) // tpg],
            "tc": sweep["tc"][off : off + step],
            "tl": sweep["tl"][off : off + step],
        }
        Pm, Qs, s = _chunk_call(
            Pm, Qs, chunk, lr, reg,
            su=su, si=si, rank=rank, tpg=tpg, nwin=nwin,
            exact=exact, interpret=interpret,
        )
        loss = loss + s
    return Pm, Qs, loss


def _chunk_call(
    Pm, Qs, sweep, lr, reg, *, su, si, rank, tpg, nwin, exact, interpret
):
    pack = 128 // rank
    pstride = su // pack + BIAS_ROWS
    ng = sweep["sa"].shape[0]
    tile = sweep["tl"].shape[2]
    f32 = jnp.float32
    hp = jnp.stack([jnp.asarray(lr, f32), jnp.asarray(reg, f32)])
    kernel = _kernel_body(su, si, rank, pack, tile, tpg, nwin, exact)
    blk = pl.BlockSpec(
        (pstride, 128),
        lambda g, hp, sa, tc: (sa[g], 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(
                (tpg, 3, tile), lambda g, *_: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            blk,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            blk,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nwin * (si // pack + BIAS_ROWS), 128), f32),
            pltpu.SMEM((1,), f32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct(Pm.shape, f32),
        jax.ShapeDtypeStruct(Qs.shape, f32),
        jax.ShapeDtypeStruct((1, 1), f32),
    ]
    # positions incl. prefetch: hp=0, sa=1, tc=2, tl=3, P=4, Q=5
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(hp, sweep["sa"], sweep["tc"], sweep["tl"], Pm, Qs)
