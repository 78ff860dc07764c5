"""Fused BPR Pallas kernel (mfx/kernels/bpr_pallas.py) vs the jnp
snapshot-minibatch oracle: each tile is one snapshot batch, so replaying
the tile stream through bpr_minibatch_update on the same local tables
must reproduce the kernel's result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfx.data import synthetic
from mfx.kernels import packing as pk
from mfx.kernels import plan_ring_device as prd
from mfx.kernels.bpr_pallas import bpr_sweep_pallas
from mfx.models import init_model
from mfx.models.mf import MFModel
from mfx.solvers.bpr import bpr_minibatch_update

U, I = 120, 128
SU = SI = 128
TILE, TPG = 64, 4
RANK = 64
LR, REG = 0.05, 0.01


def _plan_one_block(coo, j_neg):
    """Single-cell ring plan (S=1, one block, one window)."""
    u = jnp.asarray(coo.user)
    ir = jnp.asarray(coo.item)
    skel = prd.build_ring_skeleton(u, ir, 1, SU, SI, SU, SI, TILE, TPG, 1)
    slabs = prd.epoch_tiles_ring(
        skel, u, ir, None, 0, 0, payload2=jnp.asarray(j_neg), sent2=SI
    )
    assert len(slabs) == 1
    seg = skel.segments[0]
    return seg, slabs[0][0, 0]  # (nt, 3, T)


@pytest.mark.parametrize("rank", [64, 32, 128])
def test_bpr_kernel_matches_tilewise_jnp_oracle(rank):
    # pack-1 interpret mode is ~5x slower per triple; a smaller stream
    # still covers every tile-path branch (rank 128 has no sub-slot
    # select/merge to exercise)
    n_triples = 1_000 if rank == 128 else 3_000
    coo = synthetic.make_implicit_synthetic(U, I, n_triples, rank=4, seed=2)
    rng = np.random.default_rng(0)
    j_neg = rng.integers(0, I, coo.n_ratings).astype(np.int32)

    model = init_model(3, U, I, rank, global_mean=0.0)
    seg, tl = _plan_one_block(coo, j_neg)
    Pm, Qm = pk.pack_state(model, SU, SI)
    Pm2, Qm2, loss = bpr_sweep_pallas(
        Pm, Qm, {"sa": seg.sa[0, 0], "tc": seg.tc[0, 0], "tl": tl},
        LR, REG, su=SU, si=SI, rank=rank, tpg=TPG, exact=True,
        interpret=True,
    )
    got = pk.unpack_state(Pm2, Qm2, 0.0, U, I, rank, SU, SI)

    # oracle: replay tiles in order, each tile = one snapshot minibatch
    ref = MFModel(
        P=jnp.pad(model.P, ((0, SU - U), (0, 0))),
        Q=model.Q, bu=jnp.zeros((SU,)), bi=jnp.zeros((I,)),
        mu=jnp.zeros(()),
    )
    tl_np = np.asarray(tl)
    total = 0.0
    for t in range(tl_np.shape[0]):
        u_t = tl_np[t, 0]
        i_t = tl_np[t, 1]
        j_t = tl_np[t, 2]
        w = (u_t < SU).astype(np.float32)
        # clamp pad sentinels into range; weights zero them out
        ref, l = bpr_minibatch_update(
            ref,
            jnp.asarray(np.minimum(u_t, SU - 1)),
            jnp.asarray(np.minimum(i_t, I - 1)),
            jnp.asarray(np.minimum(j_t, I - 1)),
            jnp.asarray(w), LR, REG,
        )
        total += float(l)
    np.testing.assert_allclose(
        np.asarray(got.P), np.asarray(ref.P[:U]), atol=2e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.Q), np.asarray(ref.Q[:I]), atol=2e-6, rtol=1e-5
    )
    np.testing.assert_allclose(float(loss[0, 0]), total, rtol=1e-4)
