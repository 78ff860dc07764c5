"""Sharded checkpoint/resume without gathering (SURVEY.md §5.4; VERDICT
round-1 item #7): the ring trainer's row-sharded tables cross the
checkpoint boundary as sharded arrays — Orbax writes per-shard chunks and
restore re-materializes the NamedSharding — and training continues
bitwise-identically."""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mfx.config import SGDConfig
from mfx.data import synthetic
from mfx.models import init_model
from mfx.parallel.sharded import train_epochs_ring, unshard_model
from mfx.runtime.mesh import MODEL_AXIS, make_mesh
from mfx.train.checkpoint import load_checkpoint, save_checkpoint

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

U, I, N = 100, 90, 4_000
CFG = SGDConfig(lr=0.02, reg=0.02, epochs=4, batch_size=128)


def _run(mesh, coo, start_epoch=0, model=None, epochs=4):
    if model is None:
        model = init_model(0, U, I, 8, global_mean=coo.global_mean)
    cfg = dataclasses.replace(CFG, epochs=epochs)
    out = None
    for _, out, _ in train_epochs_ring(
        model, coo, cfg, use_bias=True, mesh=mesh, seed=0,
        start_epoch=start_epoch, yield_padded=True,
    ):
        pass
    return out


@requires_8
def test_sharded_save_restore_no_gather(tmp_path):
    mesh = make_mesh(model=8)
    coo = synthetic.make_synthetic(U, I, N, rank=4, noise=0.3, seed=1)

    # uninterrupted 4-epoch reference
    ref = _run(mesh, coo, epochs=4)

    # run 2 epochs, checkpoint the PADDED SHARDED model, restore, continue
    mid = _run(mesh, coo, epochs=2)
    row_sh = NamedSharding(mesh, P(MODEL_AXIS))
    assert mid.P.sharding.is_equivalent_to(row_sh, mid.P.ndim)
    save_checkpoint(tmp_path / "ck", 1, mid, seed=0)

    restored, epoch, seed = load_checkpoint(
        tmp_path / "ck",
        shardings={"P": row_sh, "Q": row_sh, "bu": row_sh, "bi": row_sh},
    )
    assert epoch == 1 and seed == 0
    # shards preserved: 8 device shards, each holding 1/8 of the rows —
    # not a gathered/replicated array
    for t in (restored.P, restored.Q, restored.bu, restored.bi):
        assert len(t.sharding.device_set) == 8
        shard_rows = {s.data.shape[0] for s in t.addressable_shards}
        assert shard_rows == {t.shape[0] // 8}
    np.testing.assert_array_equal(np.asarray(restored.P), np.asarray(mid.P))

    # continuation from the restored sharded state is bitwise-identical
    cont = _run(mesh, coo, start_epoch=2, model=restored, epochs=4)
    for a, b in [(cont.P, ref.P), (cont.Q, ref.Q), (cont.bu, ref.bu),
                 (cont.bi, ref.bi)]:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_8
def test_restore_without_shardings_keeps_saved_layout(tmp_path):
    """Even with no explicit shardings, Orbax restores the recorded
    NamedSharding (same-topology resume, the common case)."""
    mesh = make_mesh(model=8)
    coo = synthetic.make_synthetic(U, I, N, rank=4, noise=0.3, seed=2)
    mid = _run(mesh, coo, epochs=1)
    save_checkpoint(tmp_path / "ck", 0, mid, seed=0)
    restored, _, _ = load_checkpoint(tmp_path / "ck")
    assert len(restored.P.sharding.device_set) == 8
    # slicing back to real rows still works on the padded restored model
    m = unshard_model(restored, U, I)
    assert m.P.shape == (U, 8)
