"""Training driver — SURVEY.md T1.

Orchestrates a full run from a TrainConfig: data loading + split, mesh
construction, solver selection (SGD single/DP/ring/hybrid, ALS, BPR),
eval cadence, early stop at target RMSE, throughput metering
(updates/sec/chip — the BASELINE.json metric), JSONL metrics, checkpoints,
optional profiler traces. Call stack per SURVEY.md §3.2(a).
"""

from __future__ import annotations

import dataclasses
import time

import jax

from mfx.config import TrainConfig
from mfx.data.loaders import load_dataset
from mfx.data.split import chronological_split, train_test_split
from mfx.eval.metrics import rmse_mae, sampled_auc
from mfx.models.mf import MFModel, init_model
from mfx.runtime.mesh import make_mesh, distributed_init
from mfx.train.checkpoint import latest_step, load_checkpoint, save_checkpoint
from mfx.train.logging import MetricsLogger
from mfx.train.profile import maybe_trace

__all__ = ["train", "TrainResult"]


@dataclasses.dataclass
class TrainResult:
    model: MFModel
    history: list[dict]
    test_rmse: float | None
    test_mae: float | None
    test_auc: float | None
    epochs_run: int
    updates_per_sec: float
    # cfg.ranking_k metrics from the last eval (keyed 'hr', 'ndcg', ...
    # per cfg.ranking_protocol); None when ranking eval is disabled
    test_ranking: dict | None = None


def _validate_parallel_sgd(cfg: TrainConfig) -> None:
    """Reject configs whose kernel/partitioner the chosen parallel mode
    would silently ignore — asking for the Pallas kernel and getting the
    scatter baseline must be an error, not a 5x slowdown."""
    mode = cfg.parallel.mode
    sgd = cfg.sgd
    if mode == "dp" and (sgd.partitioner != "fixed" or sgd.kernel != "jnp"):
        raise ValueError(
            f"parallel.mode='dp' runs the fixed-partitioner XLA path and "
            f"ignores sgd.partitioner={sgd.partitioner!r} / "
            f"sgd.kernel={sgd.kernel!r}; set sgd.partitioner=fixed "
            "sgd.kernel=jnp explicitly, or use parallel.mode='sharded'/"
            "'hybrid' (DSGD ring) for the blocked kernels"
        )
    if mode in ("sharded", "hybrid") and sgd.kernel not in ("jnp", "pallas"):
        raise ValueError(
            f"parallel.mode={mode!r} supports sgd.kernel='pallas' (fused "
            f"kernel in the DSGD ring) or 'jnp' (scatter); got {sgd.kernel!r}"
        )
    if mode in ("sharded", "hybrid") and sgd.dense_spg > 1:
        raise ValueError(
            "sgd.dense_spg > 1 is single-chip only (the ring's per-cell "
            "dense prep has no run-padding path); set dense_spg=1 for "
            f"parallel.mode={mode!r}"
        )
    if mode in ("sharded", "hybrid") and sgd.bias_mode == "epoch":
        raise ValueError(
            "sgd.bias_mode='epoch' is single-chip only (its bias stream "
            "comes from the single-chip device planner); use 'tile' or "
            f"'lane' for parallel.mode={mode!r}"
        )
    if mode in ("sharded", "hybrid") and sgd.kernel == "jnp" and (
        sgd.dense_chi != 0
    ):
        raise ValueError(
            "the dense Zipf-head phase needs the fused kernel; set "
            "sgd.kernel=pallas (the DSGD ring runs per-shard dense strata "
            "on the held block) or sgd.dense_chi=0"
        )
    if (
        mode in ("sharded", "hybrid") and sgd.dense_echo > 1
        and sgd.bias_mode == "tile" and cfg.model.use_bias
    ):
        raise ValueError(
            "sgd.dense_echo > 1 with biases requires "
            "sgd.bias_mode='lane' (the frozen-bias dense path consumes "
            "single-pass E sums)"
        )


def _make_epoch_iter(cfg: TrainConfig, model, train_coo, seed, start_epoch,
                     mesh, feats=None, timings=None):
    use_bias = cfg.model.use_bias
    if cfg.solver == "sgd":
        mode = cfg.parallel.mode
        if mode != "single":
            _validate_parallel_sgd(cfg)
        if mode == "single":
            from mfx.solvers.sgd import train_epochs

            return train_epochs(
                model, train_coo, cfg.sgd, use_bias, seed=seed,
                start_epoch=start_epoch, timings=timings,
            )
        if mode == "dp":
            from mfx.parallel.data_parallel import train_epochs_dp

            return train_epochs_dp(
                model, train_coo, cfg.sgd, use_bias, mesh, seed=seed,
                start_epoch=start_epoch,
            )
        if mode in ("sharded", "hybrid") and cfg.sgd.kernel == "pallas":
            from mfx.parallel.ring_blocked import train_epochs_ring_blocked

            # the fused kernel inside the DSGD ring over the flattened
            # mesh (both axes form one ring; SURVEY §3.2(a))
            return train_epochs_ring_blocked(
                model, train_coo, cfg.sgd, use_bias, mesh, seed=seed,
                start_epoch=start_epoch,
                interpret=jax.default_backend() != "tpu",
            )
        if mode == "sharded":
            from mfx.parallel.sharded import train_epochs_ring

            # yield_padded: the model stays row-sharded through eval (test
            # ids index only real rows) and the checkpoint boundary (Orbax
            # writes per-shard chunks — no gather; SURVEY.md §5.4)
            return train_epochs_ring(
                model, train_coo, cfg.sgd, use_bias, mesh, seed=seed,
                start_epoch=start_epoch, yield_padded=True,
            )
        if mode == "hybrid":
            from mfx.parallel.hybrid import train_epochs_hybrid

            return train_epochs_hybrid(
                model, train_coo, cfg.sgd, use_bias, mesh, seed=seed,
                start_epoch=start_epoch, yield_padded=True,
            )
        raise ValueError(f"unknown parallel mode {mode!r}")
    if cfg.solver == "svdpp":
        # start_epoch > 0 raises inside either trainer: the MF-view
        # checkpoint cannot carry the implicit Y table
        # (SVDppModel.save_npz does)
        if cfg.parallel.mode in ("dp", "hybrid"):
            from mfx.parallel.svdpp_dp import train_epochs_svdpp_dp

            return train_epochs_svdpp_dp(
                model, train_coo, cfg.svdpp, use_bias, mesh, seed=seed,
                start_epoch=start_epoch,
            )
        if cfg.parallel.mode != "single":
            raise ValueError(
                "solver='svdpp' runs single-device or data-parallel "
                "(parallel.mode in ('single', 'dp', 'hybrid')); use "
                "solver='sgd' for the row-sharded ring paths"
            )
        from mfx.solvers.svdpp import train_epochs_svdpp

        return train_epochs_svdpp(
            model, train_coo, cfg.svdpp, use_bias, seed=seed,
            start_epoch=start_epoch,
        )
    if cfg.solver == "timesvd":
        # temporal-dynamics MF: the bias-level time streams ride the jnp
        # snapshot-minibatch path; eval/serving consume the as_mf view
        # (the driver evaluates time-aware via rmse_mae_time)
        if cfg.parallel.mode != "single":
            raise ValueError(
                "solver='timesvd' runs single-device; use solver='sgd' "
                "for the data-parallel / row-sharded paths"
            )
        if cfg.timesvd.kernel == "pallas":
            # the TPU-rate path: temporal terms lane-carried through the
            # fused blocked kernel (mfx/solvers/timesvd_blocked.py)
            from mfx.solvers.timesvd_blocked import (
                train_epochs_timesvd_blocked,
            )

            return train_epochs_timesvd_blocked(
                model, train_coo, cfg.timesvd, use_bias, seed=seed,
                start_epoch=start_epoch, feats=feats,
                interpret=jax.default_backend() != "tpu",
            )
        from mfx.solvers.timesvd import train_epochs_timesvd

        return train_epochs_timesvd(
            model, train_coo, cfg.timesvd, use_bias, seed=seed,
            start_epoch=start_epoch, feats=feats,
        )
    if cfg.solver == "timesvdpp":
        # temporal biases + implicit item factors (timeSVD++); yields
        # TimeSVDModel views over X = P + S — same eval/serving path as
        # solver='timesvd'
        if cfg.parallel.mode != "single":
            raise ValueError(
                "solver='timesvdpp' runs single-device; use solver='sgd' "
                "for the data-parallel / row-sharded paths"
            )
        from mfx.solvers.timesvdpp import train_epochs_timesvdpp

        return train_epochs_timesvdpp(
            model, train_coo, cfg.timesvdpp, use_bias, seed=seed,
            start_epoch=start_epoch, feats=feats,
        )
    if cfg.solver == "als":
        if cfg.parallel.mode == "sharded":
            from mfx.parallel.als_ring import train_sweeps_als_ring

            # sharded = no-gather row-sharded tables: ring-rotate the
            # fixed side, Grams never leave their shard (als_ring.py)
            def gen_ring():
                for sweep, m in train_sweeps_als_ring(
                    model, train_coo, cfg.als, mesh, use_bias=use_bias,
                    seed=seed,
                ):
                    yield sweep, m, float("nan")

            return gen_ring()
        if cfg.parallel.mode in ("dp", "hybrid"):
            from mfx.parallel.als_dp import train_sweeps_als_dp

            # replicated tables: sharded Gram accumulation + psum over
            # the whole mesh (right at configs[3]'s 17k-item catalog)
            def gen_dp():
                for sweep, m in train_sweeps_als_dp(
                    model, train_coo, cfg.als, mesh, use_bias=use_bias
                ):
                    yield sweep, m, float("nan")

            return gen_dp()
        from mfx.solvers.als import train_sweeps_als

        def gen():
            for sweep, m in train_sweeps_als(
                model, train_coo, cfg.als, use_bias=use_bias
            ):
                yield sweep, m, float("nan")

        return gen()
    if cfg.solver == "nmf":
        if cfg.parallel.mode in ("dp", "hybrid"):
            from mfx.parallel.nmf_dp import train_sweeps_nmf_dp

            def gen_nmf_dp():
                for sweep, m in train_sweeps_nmf_dp(
                    model, train_coo, cfg.nmf, mesh, use_bias=use_bias
                ):
                    yield sweep, m, float("nan")

            return gen_nmf_dp()
        if cfg.parallel.mode == "sharded":
            from mfx.parallel.nmf_ring import train_sweeps_nmf_ring

            # sharded = no-gather row-sharded tables: ring-rotate the
            # fixed side, Grams never leave their shard (nmf_ring.py)
            def gen_nmf_ring():
                for sweep, m in train_sweeps_nmf_ring(
                    model, train_coo, cfg.nmf, mesh, use_bias=use_bias,
                    seed=seed,
                ):
                    yield sweep, m, float("nan")

            return gen_nmf_ring()
        if cfg.parallel.mode != "single":
            raise ValueError(
                "solver='nmf' supports parallel.mode in "
                "('single', 'dp', 'hybrid', 'sharded')"
            )
        from mfx.solvers.nmf import train_sweeps_nmf

        def gen_nmf():
            for sweep, m in train_sweeps_nmf(
                model, train_coo, cfg.nmf, use_bias=use_bias
            ):
                yield sweep, m, float("nan")

        return gen_nmf()
    if cfg.solver == "ials":
        if cfg.parallel.mode in ("dp", "hybrid"):
            from mfx.parallel.ials_dp import train_sweeps_ials_dp

            def gen_ials_dp():
                for sweep, m in train_sweeps_ials_dp(
                    model, train_coo, cfg.ials, mesh, use_bias=use_bias
                ):
                    yield sweep, m, float("nan")

            return gen_ials_dp()
        if cfg.parallel.mode == "sharded":
            from mfx.parallel.ials_ring import train_sweeps_ials_ring

            def gen_ials_ring():
                for sweep, m in train_sweeps_ials_ring(
                    model, train_coo, cfg.ials, mesh, use_bias=use_bias,
                    seed=seed,
                ):
                    yield sweep, m, float("nan")

            return gen_ials_ring()
        if cfg.parallel.mode != "single":
            raise ValueError(
                "solver='ials' supports parallel.mode in "
                "('single', 'dp', 'hybrid', 'sharded')"
            )
        from mfx.solvers.ials import train_sweeps_ials

        def gen_ials():
            for sweep, m in train_sweeps_ials(
                model, train_coo, cfg.ials, use_bias=use_bias
            ):
                yield sweep, m, float("nan")

        return gen_ials()
    if cfg.solver == "bpr":
        mode = cfg.parallel.mode
        if mode == "dp":
            from mfx.parallel.data_parallel import train_epochs_bpr_dp

            return train_epochs_bpr_dp(
                model, train_coo, cfg.bpr, mesh, seed=seed,
                start_epoch=start_epoch,
            )
        if mode in ("sharded", "hybrid"):
            from mfx.parallel.bpr_sharded import train_epochs_bpr_ring

            return train_epochs_bpr_ring(
                model, train_coo, cfg.bpr, mesh, seed=seed,
                start_epoch=start_epoch,
            )
        from mfx.solvers.bpr import train_epochs_bpr

        return train_epochs_bpr(
            model, train_coo, cfg.bpr, seed=seed, start_epoch=start_epoch
        )
    raise ValueError(f"unknown solver {cfg.solver!r}")


def train(cfg: TrainConfig, resume: bool = True) -> TrainResult:
    if cfg.ranking_protocol not in ("sampled", "full", "user"):
        raise ValueError(
            "ranking_protocol must be 'sampled', 'full', or 'user', got "
            f"{cfg.ranking_protocol!r}"
        )
    distributed_init()
    seed = cfg.data.seed
    coo = load_dataset(cfg.data.dataset, root=cfg.data.root)
    if cfg.data.split == "time":
        train_coo, test_coo = chronological_split(coo, cfg.data.test_frac)
    elif cfg.data.split == "user-time":
        from mfx.data.split import user_chronological_split

        train_coo, test_coo = user_chronological_split(
            coo, cfg.data.test_frac
        )
    else:
        train_coo, test_coo = train_test_split(
            coo, cfg.data.test_frac, seed=seed
        )

    mesh = None
    if cfg.parallel.mode != "single":
        mesh = make_mesh(data=cfg.parallel.data_axis, model=cfg.parallel.model_axis)

    start_epoch = 0
    model = None
    if resume and cfg.checkpoint_dir and latest_step(cfg.checkpoint_dir) is not None:
        # restore with CURRENT-topology shardings, never the recorded ones:
        # Orbax replays the NamedSharding captured at save time, which
        # cannot be rebuilt when the device count changed (its own warning)
        # — so a sharded-mode checkpoint saved on a different mesh would
        # fail before the padded-row slice logic below ever runs.
        if mesh is None:
            # meshless resume (parallel.mode='single') of a possibly
            # sharded-mode checkpoint: restore onto this process's device
            # explicitly — replaying a recorded multi-device NamedSharding
            # fails outright when the device count changed
            from jax.sharding import SingleDeviceSharding

            dev0 = jax.devices()[0]

            def shard_fn(k, shape, dtype):
                return SingleDeviceSharding(dev0)

        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from mfx.runtime.mesh import DATA_AXIS, MODEL_AXIS

            axes = tuple(
                a for a in (DATA_AXIS, MODEL_AXIS) if mesh.shape.get(a, 1) > 1
            ) or (MODEL_AXIS,)
            S = 1
            for a in axes:
                S *= mesh.shape[a]
            row_sharded = cfg.parallel.mode in ("sharded", "hybrid")

            def shard_fn(k, shape, dtype, _S=S, _axes=axes):
                if (
                    row_sharded
                    and k in ("P", "Q", "bu", "bi")
                    and shape
                    and shape[0] % _S == 0
                ):
                    return NamedSharding(mesh, PartitionSpec(_axes))
                return NamedSharding(mesh, PartitionSpec())

        model, ckpt_epoch, _ = load_checkpoint(cfg.checkpoint_dir, shardings=shard_fn)
        start_epoch = ckpt_epoch + 1
        if model.num_users > coo.num_users or model.num_items > coo.num_items:
            # sharded-mode checkpoints store the PADDED tables (pad rows
            # are zeros). Slice back to the dataset's real rows so the
            # trainer re-pads for the CURRENT topology — restoring onto a
            # different mesh size than the one that saved would otherwise
            # misalign the ring plan's block arithmetic with the table
            # layout and silently train wrong rows.
            from mfx.parallel.sharded import unshard_model

            model = unshard_model(model, coo.num_users, coo.num_items)
    if model is None:
        import jax.numpy as jnp

        dtype = jnp.dtype(cfg.model.dtype)
        if dtype != jnp.float32 and cfg.sgd.kernel == "pallas":
            raise ValueError(
                "the fused Pallas kernel keeps factor tables in float32 "
                "(bf16 accumulation loses SGD deltas); use kernel='jnp' or "
                "'blocked_jnp' for low-precision tables"
            )
        model = init_model(
            cfg.model.seed,
            coo.num_users,
            coo.num_items,
            cfg.model.rank,
            global_mean=train_coo.global_mean,
            init_scale=cfg.model.init_scale,
            dtype=dtype,
        )
        if cfg.model.bias_init == "baseline" and cfg.model.use_bias:
            # fresh runs only (a resumed checkpoint carries trained
            # biases): start from the damped-mean baseline predictor
            from mfx.models.mf import baseline_biases

            bu0, bi0 = baseline_biases(
                train_coo, damping=cfg.model.bias_damping
            )
            model = dataclasses.replace(
                model, bu=bu0.astype(dtype), bi=bi0.astype(dtype)
            )

    log = MetricsLogger(cfg.log_path)
    clip = (0.5, 5.0) if cfg.clip_predictions else None
    implicit = cfg.solver in ("bpr", "ials")
    n_chips = jax.device_count() if mesh is None else mesh.devices.size

    feats = None
    if cfg.solver in ("timesvd", "timesvdpp"):
        # host time featurizer, shared by the trainer and the time-aware
        # eval (deterministic from the train split — rebuilt, not saved)
        from mfx.models.timesvd import fit_time_features

        tc = cfg.timesvd if cfg.solver == "timesvd" else cfg.timesvdpp
        feats = fit_time_features(train_coo, n_bins=tc.n_bins, beta=tc.beta)

    def _mf(m):
        # temporal models fold their time terms at the end of the train
        # window for the MF-only consumers (AUC, ranking, checkpoints,
        # the returned model); everything else passes through unchanged
        if feats is not None and hasattr(m, "as_mf"):
            return m.as_mf(feats)
        return m

    def _rmse_eval(m):
        if feats is not None and test_coo.timestamp is not None:
            from mfx.solvers.timesvd import rmse_mae_time

            # each held-out rating predicted at its OWN timestamp
            return rmse_mae_time(m, feats, test_coo, clip=clip)
        return rmse_mae(_mf(m), test_coo, clip=clip)

    # sampled negatives (AUC and the 'sampled' ranking protocol) reject
    # against ALL observed positives (train and held-out) — built once
    _auc_keys = None

    def _keys():
        nonlocal _auc_keys
        if _auc_keys is None:
            import numpy as np

            from mfx.data.bpr import build_positive_index

            _auc_keys = np.concatenate(
                [build_positive_index(train_coo), build_positive_index(test_coo)]
            )
            _auc_keys.sort()
        return _auc_keys

    def _auc(m):
        return sampled_auc(_mf(m), test_coo, seed=seed, pos_keys=_keys())

    def _ranking(m):
        from mfx.eval.ranking import (
            full_hr_ndcg_at_k, hr_ndcg_at_k, user_topk_metrics,
        )

        m = _mf(m)
        k = cfg.ranking_k
        if cfg.ranking_protocol == "sampled":
            return hr_ndcg_at_k(m, test_coo, k=k, seed=seed, pos_keys=_keys())
        if cfg.ranking_protocol == "full":
            return full_hr_ndcg_at_k(m, test_coo, train=train_coo, k=k)
        if cfg.ranking_protocol == "user":
            return user_topk_metrics(m, test_coo, train=train_coo, k=k)
        raise ValueError(
            "ranking_protocol must be 'sampled', 'full', or 'user', got "
            f"{cfg.ranking_protocol!r}"
        )

    # per-phase attribution (cfg.profile_phases): the blocked trainer
    # fills dense_s/sparse_s once (standalone-phase probe) and plan_s
    # cumulatively; the loop below turns them into per-epoch record
    # fields (plan_ms as the per-epoch delta)
    timings = {"phase_probe": True, "plan_s": 0.0} if (
        cfg.profile_phases
        and cfg.solver == "sgd"
        and cfg.parallel.mode == "single"
    ) else None
    plan_s_seen = 0.0
    it = _make_epoch_iter(cfg, model, train_coo, seed, start_epoch, mesh,
                          feats=feats, timings=timings)
    epochs_run = 0
    last_ups = 0.0
    test_rmse = test_mae = test_auc = test_ranking = None
    t_prev = time.time()
    with maybe_trace(cfg.profile_dir):
        for epoch, model, train_metric in it:
            # blocked-path models are lazy views over the packed tables;
            # wait on the epoch's work without forcing an unpack
            if hasattr(model, "block_until_ready"):
                model.block_until_ready()
            else:
                jax.block_until_ready(model.P)
            dt = time.time() - t_prev
            last_ups = train_coo.n_ratings / max(1e-9, dt)
            rec = {
                "epoch": epoch,
                "train_metric": round(float(train_metric), 6),
                "epoch_s": round(dt, 3),
                "updates_per_sec": round(last_ups, 1),
                "updates_per_sec_per_chip": round(last_ups / n_chips, 1),
            }
            if timings is not None:
                plan_total = timings.get("plan_s", 0.0)
                rec["plan_ms"] = round((plan_total - plan_s_seen) * 1e3, 2)
                plan_s_seen = plan_total
                if "dense_s" in timings:
                    rec["dense_ms"] = round(timings["dense_s"] * 1e3, 2)
                    rec["sparse_ms"] = round(timings["sparse_s"] * 1e3, 2)
            t_eval = time.time()
            if cfg.eval_every and (epoch + 1) % cfg.eval_every == 0:
                if implicit:
                    test_auc = _auc(model)
                    rec["test_auc"] = round(test_auc, 5)
                else:
                    test_rmse, test_mae = _rmse_eval(model)
                    rec["test_rmse"] = round(test_rmse, 5)
                    rec["test_mae"] = round(test_mae, 5)
                if cfg.ranking_k:
                    test_ranking = _ranking(model)
                    rec.update({
                        f"test_{n}@{cfg.ranking_k}": round(v, 5)
                        for n, v in test_ranking.items()
                    })
                if timings is not None:
                    rec["eval_ms"] = round((time.time() - t_eval) * 1e3, 2)
            log.log(**rec)
            if cfg.checkpoint_dir and cfg.checkpoint_every and (
                (epoch + 1) % cfg.checkpoint_every == 0
            ):
                save_checkpoint(cfg.checkpoint_dir, epoch, _mf(model), seed,
                                block=not cfg.checkpoint_async)
            epochs_run = epoch + 1
            if (
                cfg.target_rmse is not None
                and test_rmse is not None
                and test_rmse <= cfg.target_rmse
            ):
                log.log(event="target_rmse_reached", epoch=epoch,
                        test_rmse=round(test_rmse, 5))
                break
            t_prev = time.time()
    if hasattr(model, "materialize"):
        model = model.materialize()  # lazy packed view -> MFModel pytree
    if cfg.checkpoint_dir:
        save_checkpoint(cfg.checkpoint_dir, max(0, epochs_run - 1),
                        _mf(model), seed)
    # padded sharded-mode models: slice back to the real rows for the result
    if cfg.solver == "sgd" and cfg.parallel.mode in ("sharded", "hybrid"):
        from mfx.parallel.sharded import unshard_model

        model = unshard_model(model, coo.num_users, coo.num_items)
    # final eval if none happened yet
    if test_rmse is None and not implicit:
        test_rmse, test_mae = _rmse_eval(model)
    if implicit and test_auc is None:
        test_auc = _auc(model)
    if cfg.ranking_k and test_ranking is None:
        test_ranking = _ranking(model)
    # the result carries the MF view (full temporal state is available
    # via mfx.solvers.timesvd / TimeSVDModel.save_npz)
    model = _mf(model)
    log.close()
    return TrainResult(
        model=model,
        history=log.records,
        test_rmse=test_rmse,
        test_mae=test_mae,
        test_auc=test_auc,
        epochs_run=epochs_run,
        updates_per_sec=last_ups,
        test_ranking=test_ranking,
    )
