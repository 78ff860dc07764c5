"""Checkpoints pin the dataset generator/relabel version (ADVICE r4).

GENERATOR_VERSION changes the dense id assignment of real datasets
(v6 frequency-relabels BOTH axes), so a checkpoint trained under one
version indexes the wrong user/item rows of a dataset re-parsed under
another. save_checkpoint stamps the version; load_checkpoint warns
loudly on mismatch (including unstamped pre-v6 checkpoints).
"""

import warnings

import numpy as np
import pytest

from mfx.models.mf import init_model
from mfx.train import checkpoint as ckpt
from mfx.train.checkpoint import load_checkpoint, save_checkpoint


def _model():
    return init_model(0, 13, 7, 4, global_mean=3.5)


def test_checkpoint_roundtrip_same_version_is_silent(tmp_path):
    save_checkpoint(tmp_path / "c", 1, _model(), seed=3)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        m, epoch, seed = load_checkpoint(tmp_path / "c")
    assert epoch == 1 and seed == 3
    np.testing.assert_array_equal(np.asarray(m.P), np.asarray(_model().P))


def test_checkpoint_warns_on_generator_version_mismatch(tmp_path, monkeypatch):
    save_checkpoint(tmp_path / "c", 2, _model())
    monkeypatch.setattr(ckpt, "GENERATOR_VERSION", ckpt.GENERATOR_VERSION + 1)
    with pytest.warns(UserWarning, match="generator"):
        load_checkpoint(tmp_path / "c")
