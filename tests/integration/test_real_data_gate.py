"""The real-data quality-gate branch of the bench (VERDICT r3 missing #2).

Every bench ever recorded ran the synthetic fallback, so the
``TARGET_RMSE_REAL`` branch (mfx/bench.py) — the 0.92 absolute RMSE gate
that activates when real rating files appear under the data root — had
never executed. This writes a tiny ML-100K-format RAW fixture (the real
``u.data`` tab-separated layout) under a temp root and drives
``run_bench`` end-to-end through it, so the day real MovieLens data is
dropped in, the path is known-good.
"""

import numpy as np

from mfx.bench import TARGET_RMSE_REAL, run_bench
from mfx.data import synthetic


def _write_ml100k_fixture(root, num_users=300, num_items=200, n=8_000):
    """Dump a seeded low-rank rating set in the ml-100k u.data format."""
    coo = synthetic.make_synthetic(
        num_users, num_items, n, rank=4, seed=11, star_step=1.0
    )
    raw = root / "ml-100k"
    raw.mkdir(parents=True)
    lines = [
        # raw ids offset so the loader's densify path does real work
        f"{u + 1}\t{i + 101}\t{r:g}\t{880000000 + k}"
        for k, (u, i, r) in enumerate(
            zip(coo.user.tolist(), coo.item.tolist(), coo.rating.tolist())
        )
    ]
    (raw / "u.data").write_text("\n".join(lines) + "\n")
    return coo


def test_bench_real_data_gate(tmp_path):
    coo = _write_ml100k_fixture(tmp_path)
    result = run_bench(
        preset="ml100k_rank16",
        epochs=1,
        convergence=False,
        dataset="ml-100k",
        overrides=[
            f"data.root={tmp_path}",
            "sgd.partitioner=blocked",
            "sgd.kernel=pallas",
            "sgd.ublock=128",
            "sgd.iblock=128",
            "sgd.tile=64",
        ],
    )
    # the raw fixture was parsed as REAL data, so the absolute RMSE gate
    # applies — not the synthetic-floor analog
    assert result["synthetic"] is False
    assert result["target_rmse"] == TARGET_RMSE_REAL == 0.92
    assert result["dataset_shape"] == [coo.num_users, coo.num_items, coo.n_ratings]
    assert result["value"] > 0
    # the real-data npz cache was written under the real (non-synthetic)
    # name, so subsequent loads skip the parser and keep provenance
    assert any(
        p.name.startswith("ml-100k.v") and p.name.endswith(".npz")
        and ".synthetic." not in p.name
        for p in tmp_path.iterdir()
    )


def test_bench_real_data_reaches_gate_when_converged(tmp_path):
    """epochs_to_target reports against the 0.92 absolute on real data
    (the fixture is low-noise rank-4, so a few epochs beat 0.92)."""
    _write_ml100k_fixture(tmp_path)
    result = run_bench(
        preset="ml100k_rank16",
        epochs=1,
        convergence=True,
        dataset="ml-100k",
        overrides=[
            f"data.root={tmp_path}",
            "sgd.partitioner=blocked",
            "sgd.kernel=pallas",
            "sgd.ublock=128",
            "sgd.iblock=128",
            "sgd.tile=64",
        ],
    )
    assert result["synthetic"] is False
    assert result["target_rmse"] == 0.92
    assert result["epochs_to_target"] is not None
    assert np.isfinite(result["test_rmse_after"])
