"""Cross-topology resume THROUGH train() (ADVICE round 2, finding 1):
a sharded-mode checkpoint saved on an 8-shard mesh must resume on a
4-shard mesh. The driver passes current-topology shardings to
load_checkpoint — restoring without them replays the saved NamedSharding,
which Orbax cannot rebuild on a different device count."""

import dataclasses

import jax
import numpy as np
import pytest

from mfx.config import (
    DataConfig, ModelConfig, ParallelConfig, SGDConfig, TrainConfig,
)
from mfx.train.driver import train

requires_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _cfg(tmp_path, model_axis, epochs, dataset_root):
    return TrainConfig(
        name="xtopo",
        data=DataConfig(dataset="synthetic-small", root=str(dataset_root)),
        model=ModelConfig(rank=8, use_bias=True),
        sgd=SGDConfig(lr=0.02, reg=0.02, epochs=epochs, batch_size=256,
                      dup_trust=16.0),
        parallel=ParallelConfig(mode="sharded", model_axis=model_axis),
        checkpoint_dir=str(tmp_path / "ck"),
        checkpoint_every=1,
        eval_every=0,
    )


@requires_8
def test_resume_on_smaller_mesh(tmp_path):
    # 2 epochs on 8 shards, checkpointing each epoch
    r1 = train(_cfg(tmp_path, 8, 2, tmp_path), resume=False)
    assert r1.epochs_run == 2

    # resume the SAME run on a 4-shard mesh: restore must not replay the
    # 8-device sharding; the driver re-pads for the new topology
    r2 = train(_cfg(tmp_path, 4, 4, tmp_path), resume=True)
    assert r2.epochs_run == 4
    assert np.isfinite(np.asarray(r2.model.P)).all()
    assert r2.test_rmse is not None and np.isfinite(r2.test_rmse)

    # and back up to 8 shards
    r3 = train(_cfg(tmp_path, 8, 5, tmp_path), resume=True)
    assert r3.epochs_run == 5
    assert np.isfinite(np.asarray(r3.model.P)).all()


@requires_8
def test_resume_sharded_checkpoint_on_single_device(tmp_path):
    """A sharded-mode checkpoint must also resume with
    parallel.mode='single' (no mesh): the driver restores onto this
    process's device explicitly instead of replaying the recorded
    8-device sharding (code-review round 3, finding 1)."""
    r1 = train(_cfg(tmp_path, 8, 2, tmp_path), resume=False)
    assert r1.epochs_run == 2

    single = dataclasses.replace(
        _cfg(tmp_path, 1, 4, tmp_path),
        parallel=ParallelConfig(mode="single"),
    )
    r2 = train(single, resume=True)
    assert r2.epochs_run == 4
    assert np.isfinite(np.asarray(r2.model.P)).all()
    assert r2.test_rmse is not None and np.isfinite(r2.test_rmse)
