"""Dense-stratum SGD Pallas kernel — the Zipf-head fast path (K1b).

Real rating data is heavily head-concentrated (ML-25M: the top ~512 movies
carry ~38% of ratings). For strata whose density χ = nnz/(su·si) exceeds
~0.5–1%, the one-hot scheme (cost ∝ 4·K·(su+si) FLOP/rating) loses to the
classic dense DSGD update (cost ∝ 6·K/χ FLOP/rating):

    S = P_blk Q_winᵀ,   E = W ∘ (R − S − bu⊗1 − 1⊗bi − μ)
    P_blk += lr (E Q_win − reg·Du ∘ P_blk)
    Q_win += lr (Eᵀ P_blk − reg·Di ∘ Q_win)

with Du/Di the per-row rating counts in the stratum (so L2 matches the
per-occurrence regularization of the sparse path). One stratum = one
snapshot minibatch.

Layout: factor tables stay in the shared rank-packed merged layout
((rows/pack, 128), pack = 128//rank; sgd_pallas.py). For pack == 2 the
dense algebra runs in a **decimated** convention: S and R split into
(ee, eo, oe, oo) parity blocks so every matmul is a plain
(sup, 64)×(64, sip) product on the packed columns — no repacking, no
in-kernel reshapes. R is stored pre-decimated by the host prep
(mfx/solvers/dense_prep.py); W is recovered as R > 0 (ratings are ≥ 0.5).

Biases are FROZEN during the dense phase: per-stratum bias vectors are
precomputed into broadcast-ready aux arrays, and the kernel emits
per-stratum E row/column sums from which the driver applies one batched
bias update after the phase (documented snapshot semantics).

Per-stratum structure mirrors sgd_pallas.py: grid over strata sorted by
user block; P blocks stream through the pipeline via scalar-prefetched
block ids; the Q head segment is VMEM-resident; R/aux blocks are pipelined
inputs. Deterministic (sequential grid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mfx.kernels.sgd_pallas import BIAS_ROWS

__all__ = ["dense_sgd_phase_pallas", "DSTAR"]

# strata per kernel call: bounds SMEM scalar prefetch (sa, sc)
_STRATA_CHUNK = 32768

# Per-row trust scaling: a full-stratum batch step on a row with in-stratum
# degree d has curvature ∝ lr·d·‖row‖², so rows with d > DSTAR take the
# step scaled by DSTAR/d (gradient direction preserved; keeps
# lr·d_eff ≤ 16·lr, the stability region of the Jacobi-style dense update
# for lr ≲ 0.1). Light rows (d ≤ DSTAR) match plain minibatch SGD exactly.
DSTAR = 16.0


def _kernel_body(su, si, rank, pack, nwin, use_bias, exact):
    if pack != 2:
        raise NotImplementedError(
            "dense path currently supports rank 64 (pack=2); rank-128 "
            "(pack=1) needs the undecimated variant"
        )
    sup, sip = su // pack, si // pack
    qstride = sip + BIAS_ROWS
    prec = lax.Precision.HIGHEST if exact else None
    f32 = jnp.float32
    K = rank

    def dotg(x, y, dims):
        return lax.dot_general(
            x, y, (dims, ((), ())), precision=prec, preferred_element_type=f32
        )

    def kernel(
        hp_ref, sa_ref, sc_ref,  # prefetch: f32[4], i32[ND], i32[ND]
        R_ref,  # (1, 4*sup, sip) decimated raw ratings (0 = absent)
        aux_u_ref,  # (1, sup, 8) cols: bu_e, bu_o, Du_e, Du_o, Di_e, Di_o
        aux_i_ref,  # (1, 8, sip) rows: bi_e, bi_o
        P_in, Q_in,  # aliased inputs
        P_out, Q_hbm, dbu_ref, dbi_ref, sse_ref,  # outputs
        Qseg, acc_ref, sem,  # scratch
    ):
        del Q_in
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        lr = hp_ref[0]
        reg = hp_ref[1]
        mu = hp_ref[2]

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

        qs = sc_ref[g] * qstride
        Pblk = P_out[0:sup, :]
        Pe = Pblk[:, 0:K]  # even local rows
        Po = Pblk[:, K:128]
        Qwin = Qseg[pl.ds(qs, sip), :]
        Qe = Qwin[:, 0:K]
        Qo = Qwin[:, K:128]

        # S parity blocks: (sup, K) @ (K, sip) as contraction over dim 1/1
        dims_nt = ((1,), (1,))  # x (sup,K) · y (sip,K) -> (sup, sip)
        S_ee = dotg(Pe, Qe, dims_nt)
        S_eo = dotg(Pe, Qo, dims_nt)
        S_oe = dotg(Po, Qe, dims_nt)
        S_oo = dotg(Po, Qo, dims_nt)

        # R is stored bf16 (half the HBM stream; ratings are quarter-step
        # values ≤ 5, exactly representable in bf16)
        R_ee = R_ref[0, 0 * sup : 1 * sup, :].astype(f32)
        R_eo = R_ref[0, 1 * sup : 2 * sup, :].astype(f32)
        R_oe = R_ref[0, 2 * sup : 3 * sup, :].astype(f32)
        R_oo = R_ref[0, 3 * sup : 4 * sup, :].astype(f32)

        if use_bias:
            bu_e = aux_u_ref[0, :, 0:1]  # (sup, 1)
            bu_o = aux_u_ref[0, :, 1:2]
            bi_e = aux_i_ref[0, 0:1, :]  # (1, sip)
            bi_o = aux_i_ref[0, 1:2, :]
        else:
            bu_e = bu_o = jnp.zeros((sup, 1), f32)
            bi_e = bi_o = jnp.zeros((1, sip), f32)

        def resid(R, S, bu, bi):
            return jnp.where(R > 0.0, R - S - bu - bi - mu, 0.0)

        E_ee = resid(R_ee, S_ee, bu_e, bi_e)
        E_eo = resid(R_eo, S_eo, bu_e, bi_o)
        E_oe = resid(R_oe, S_oe, bu_o, bi_e)
        E_oo = resid(R_oo, S_oo, bu_o, bi_o)

        Du_e = aux_u_ref[0, :, 2:3]  # (sup, 1) stratum degrees
        Du_o = aux_u_ref[0, :, 3:4]
        Di_e = aux_u_ref[0, :, 4:5]  # (sip, 1); dense path requires su == si
        Di_o = aux_u_ref[0, :, 5:6]
        # trust scaling for heavy rows (see DSTAR)
        s_ue = jnp.minimum(1.0, DSTAR / jnp.maximum(Du_e, 1.0))
        s_uo = jnp.minimum(1.0, DSTAR / jnp.maximum(Du_o, 1.0))
        s_ie = jnp.minimum(1.0, DSTAR / jnp.maximum(Di_e, 1.0))
        s_io = jnp.minimum(1.0, DSTAR / jnp.maximum(Di_o, 1.0))

        dims_nn = ((1,), (0,))  # (sup,sip) · (sip,K) -> (sup,K)
        dPe = dotg(E_ee, Qe, dims_nn) + dotg(E_eo, Qo, dims_nn)
        dPo = dotg(E_oe, Qe, dims_nn) + dotg(E_oo, Qo, dims_nn)
        dims_tn = ((0,), (0,))  # (sup,sip) ·ᵀ (sup,K) -> (sip,K)
        dQe = dotg(E_ee, Pe, dims_tn) + dotg(E_oe, Po, dims_tn)
        dQo = dotg(E_eo, Pe, dims_tn) + dotg(E_oo, Po, dims_tn)

        # full-width writes (lane sub-range stores need masking in Mosaic)
        P_out[0:sup, :] = jnp.concatenate(
            [
                Pe + lr * s_ue * (dPe - reg * Du_e * Pe),
                Po + lr * s_uo * (dPo - reg * Du_o * Po),
            ],
            axis=1,
        )
        Qseg[pl.ds(qs, sip), :] = jnp.concatenate(
            [
                Qe + lr * s_ie * (dQe - reg * Di_e * Qe),
                Qo + lr * s_io * (dQo - reg * Di_o * Qo),
            ],
            axis=1,
        )

        # per-stratum E sums for the post-phase bias update (single writes)
        dbu_ref[0, :, :] = jnp.concatenate(
            [
                jnp.sum(E_ee + E_eo, axis=1)[:, None],
                jnp.sum(E_oe + E_oo, axis=1)[:, None],
                jnp.zeros((sup, 6), f32),
            ],
            axis=1,
        )
        dbi_ref[0, :, :] = jnp.concatenate(
            [
                jnp.sum(E_ee + E_oe, axis=0)[None, :],
                jnp.sum(E_eo + E_oo, axis=0)[None, :],
                jnp.zeros((6, sip), f32),
            ],
            axis=0,
        )

        acc_ref[0] = (
            acc_ref[0]
            + jnp.sum(E_ee**2) + jnp.sum(E_eo**2)
            + jnp.sum(E_oe**2) + jnp.sum(E_oo**2)
        )

        @pl.when(g == ng - 1)
        def _():
            cp = pltpu.make_async_copy(
                Qseg, Q_hbm.at[pl.ds(0, nwin * qstride), :], sem
            )
            cp.start()
            cp.wait()
            sse_ref[:, :] = acc_ref[0][None, None]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "su", "si", "rank", "nwin", "use_bias", "exact", "interpret"
    ),
)
def dense_sgd_phase_pallas(
    Pm: jax.Array,  # merged user table (A*(sup+8), 128), donated
    Qh: jax.Array,  # merged item table; only the first nwin windows touched
    dense: dict[str, jax.Array],
    # sa (ND,) i32 user-block per stratum (sorted); sc (ND,) i32 head window
    # R (ND, 4*sup, sip) f32 decimated raw ratings
    # aux_u (ND, sup, 8); aux_i (ND, 8, sip)
    lr,
    reg,
    mu,
    *,
    su: int,
    si: int,
    rank: int,
    nwin: int,
    use_bias: bool = True,
    exact: bool = False,
    interpret: bool = False,
):
    """Run the dense phase. Returns (Pm, Qh, dbu, dbi, sse) where dbu/dbi
    are per-stratum E sums for the post-phase bias update."""
    pack = 128 // rank
    nd = dense["sa"].shape[0]
    sup, sip = su // pack, si // pack
    f32 = jnp.float32
    hp = jnp.stack(
        [jnp.asarray(lr, f32), jnp.asarray(reg, f32), jnp.asarray(mu, f32)]
    )
    kernel = _kernel_body(su, si, rank, pack, nwin, use_bias, exact)
    pstride = sup + BIAS_ROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nd,),
        in_specs=[
            pl.BlockSpec((1, 4 * sup, sip), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sup, 8), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sip), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pstride, 128), lambda g, hp, sa, sc: (sa[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # Q head
        ],
        out_specs=[
            pl.BlockSpec((pstride, 128), lambda g, hp, sa, sc: (sa[g], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, sup, 8), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, sip), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nwin * (sip + BIAS_ROWS), 128), f32),
            pltpu.SMEM((1,), f32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct(Pm.shape, f32),
        jax.ShapeDtypeStruct(Qh.shape, f32),
        jax.ShapeDtypeStruct((nd, sup, 8), f32),
        jax.ShapeDtypeStruct((nd, 8, sip), f32),
        jax.ShapeDtypeStruct((1, 1), f32),
    ]
    # positional indices incl. prefetch: hp=0, sa=1, sc=2, R=3, aux_u=4,
    # aux_i=5, P=6, Q=7
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={6: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(hp, dense["sa"], dense["sc"], dense["R"], dense["aux_u"],
      dense["aux_i"], Pm, Qh)
