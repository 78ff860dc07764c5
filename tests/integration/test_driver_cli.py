"""End-to-end integration: CLI → train → checkpoint → resume → eval
(SURVEY.md §4.2 integration/bench smoke)."""

import json
import io
import contextlib

import numpy as np
import pytest

import mfx.cli
from mfx.config import preset, apply_overrides
from mfx.train.checkpoint import latest_step, load_checkpoint, save_checkpoint
from mfx.train.driver import train
from mfx.models import init_model


def _run_cli(args):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = mfx.cli.main(args)
    return rc, buf.getvalue()


def test_cli_train_eval_roundtrip(tmp_path):
    ckpt = tmp_path / "ckpt"
    log = tmp_path / "log.jsonl"
    rc, out = _run_cli([
        "train", "--preset", "ml100k_rank16",
        "--set", "sgd.epochs=3",
        "--set", "sgd.batch_size=4096",
        "--set", "sgd.partitioner=fixed",
        "--set", "data.dataset=synthetic-small",
        "--set", f"data.root={tmp_path}",
        "--set", f"checkpoint_dir={ckpt}",
        "--set", "checkpoint_every=1",
        "--set", f"log_path={log}",
    ])
    assert rc == 0
    summary = json.loads(out)
    assert summary["epochs_run"] == 3
    assert 0 < summary["test_rmse"] < 1.0
    assert len(log.read_text().splitlines()) == 3
    assert latest_step(ckpt) == 2

    rc, out = _run_cli([
        "eval", "--checkpoint", str(ckpt), "--dataset", "synthetic-small",
        "--root", str(tmp_path),
    ])
    assert rc == 0
    ev = json.loads(out)
    assert abs(ev["rmse"] - summary["test_rmse"]) < 1e-6

    # ranking metrics off a checkpoint: leave-one-out split, full-catalog
    # protocol (train-side interactions excluded from the competitor set)
    rc, out = _run_cli([
        "eval", "--checkpoint", str(ckpt), "--dataset", "synthetic-small",
        "--root", str(tmp_path), "--split", "loo",
        "--ranking-k", "5", "--ranking-protocol", "full",
    ])
    assert rc == 0
    ev = json.loads(out)
    for m in ("hr@5", "ndcg@5", "mrr@5"):
        assert 0.0 <= ev[m] <= 1.0
    assert ev["mrr@5"] <= ev["ndcg@5"] <= ev["hr@5"] + 1e-9

    # per-user multi-positive protocol over the served lists
    rc, out = _run_cli([
        "eval", "--checkpoint", str(ckpt), "--dataset", "synthetic-small",
        "--root", str(tmp_path),
        "--ranking-k", "5", "--ranking-protocol", "user",
    ])
    assert rc == 0
    ev = json.loads(out)
    for m in ("recall@5", "precision@5", "ndcg@5", "map@5", "coverage@5",
              "novelty@5"):
        assert m in ev
    assert 0.0 <= ev["recall@5"] <= 1.0 and ev["novelty@5"] > 0.0


def test_driver_ranking_cadence(tmp_path):
    """cfg.ranking_k: ranking metrics ride the eval cadence into the
    JSONL history and the result; bad protocol fails fast."""
    cfg = apply_overrides(preset("ml100k_rank16"), [
        "sgd.epochs=2", "sgd.batch_size=4096", "sgd.partitioner=fixed",
        "data.dataset=synthetic-small", f"data.root={tmp_path}",
        "ranking_k=5", "ranking_protocol=user",
    ])
    res = train(cfg)
    assert res.test_ranking is not None
    assert set(res.test_ranking) >= {"recall", "precision", "ndcg", "map"}
    assert any("test_recall@5" in r for r in res.history)

    bad = apply_overrides(cfg, ["ranking_protocol=nope"])
    with pytest.raises(ValueError, match="ranking_protocol"):
        train(bad)


def test_model_npz_roundtrip(tmp_path):
    model = init_model(3, 17, 23, rank=4, global_mean=3.2)
    p = tmp_path / "m.npz"
    model.save_npz(p)
    back = type(model).load_npz(p)
    for f in ("P", "Q", "bu", "bi", "mu"):
        np.testing.assert_array_equal(
            np.asarray(getattr(back, f)), np.asarray(getattr(model, f))
        )
    host = type(model).load_npz(p, device=False)
    assert isinstance(host.P, np.ndarray)


def test_cli_export_then_recommend(tmp_path):
    """export: checkpoint -> npz; the artifact serves identically."""
    from mfx.models.mf import MFModel
    from mfx.serve import TopKRecommender
    from mfx.train.checkpoint import load_checkpoint

    ckpt = tmp_path / "ckpt"
    rc, _ = _run_cli([
        "train", "--preset", "ml100k_rank16",
        "--set", "sgd.epochs=1", "--set", "sgd.partitioner=fixed",
        "--set", "sgd.batch_size=4096",
        "--set", "data.dataset=synthetic-small",
        "--set", f"data.root={tmp_path}",
        "--set", f"checkpoint_dir={ckpt}",
        "--set", "checkpoint_every=1",
    ])
    assert rc == 0
    out_npz = str(tmp_path / "model.npz")
    rc, out = _run_cli(["export", "--checkpoint", str(ckpt),
                        "--out", out_npz])
    assert rc == 0
    meta = json.loads(out)
    assert meta["rank"] == 16
    exported = MFModel.load_npz(out_npz)
    ckpt_model, _, _ = load_checkpoint(ckpt)
    ei, _ = TopKRecommender(exported).recommend([0, 5], k=4)
    ci, _ = TopKRecommender(ckpt_model).recommend([0, 5], k=4)
    assert (ei == ci).all()


def test_cli_recommend_from_checkpoint(tmp_path):
    """recommend: checkpoint → top-K JSON lines, seen items excluded."""
    from mfx.api import load_dataset

    ckpt = tmp_path / "ckpt"
    rc, _ = _run_cli([
        "train", "--preset", "ml100k_rank16",
        "--set", "sgd.epochs=1",
        "--set", "sgd.partitioner=fixed",
        "--set", "sgd.batch_size=4096",
        "--set", "data.dataset=synthetic-small",
        "--set", f"data.root={tmp_path}",
        "--set", f"checkpoint_dir={ckpt}",
        "--set", "checkpoint_every=1",
    ])
    assert rc == 0
    rc, out = _run_cli([
        "recommend", "--checkpoint", str(ckpt), "--users", "0,3",
        "--k", "5", "--dataset", "synthetic-small", "--root", str(tmp_path),
    ])
    assert rc == 0
    lines = [json.loads(l) for l in out.splitlines()]
    assert [l["user"] for l in lines] == [0, 3]
    coo = load_dataset("synthetic-small", root=tmp_path)
    for line in lines:
        assert len(line["items"]) == 5
        assert len(set(line["items"])) == 5
        # descending scores, seen items excluded
        assert line["scores"] == sorted(line["scores"], reverse=True)
        seen = set(coo.item[coo.user == line["user"]].tolist())
        assert not seen & set(line["items"])
    # related-items serving from the same checkpoint
    rc, out = _run_cli([
        "similar", "--checkpoint", str(ckpt), "--items", "1,7", "--k", "4",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in out.splitlines()]
    assert [l["item"] for l in lines] == [1, 7]
    for line in lines:
        assert len(set(line["similar"])) == 4
        assert line["item"] not in line["similar"]
        assert line["cosine"] == sorted(line["cosine"], reverse=True)
        assert all(c <= 1.0 + 1e-5 for c in line["cosine"])


def test_driver_resume_continues(tmp_path):
    cfg = apply_overrides(
        preset("ml100k_rank16"),
        [
            "sgd.epochs=2", "sgd.partitioner=fixed", "sgd.batch_size=4096",
            "data.dataset=synthetic-small", f"data.root={tmp_path}",
            f"checkpoint_dir={tmp_path/'ck'}", "checkpoint_every=1",
        ],
    )
    r1 = train(cfg)
    assert r1.epochs_run == 2
    # extend to 4 epochs; resume should start from epoch 2
    cfg4 = apply_overrides(cfg, ["sgd.epochs=4"])
    r2 = train(cfg4, resume=True)
    assert r2.epochs_run == 4
    assert r2.history[0]["epoch"] == 2  # resumed, not restarted
    assert r2.test_rmse <= r1.test_rmse + 1e-6


def test_checkpoint_roundtrip(tmp_path):
    model = init_model(0, 50, 40, 8, global_mean=3.2)
    save_checkpoint(tmp_path / "c", 7, model, seed=3)
    back, epoch, seed = load_checkpoint(tmp_path / "c")
    assert epoch == 7 and seed == 3
    np.testing.assert_array_equal(np.asarray(back.P), np.asarray(model.P))
    np.testing.assert_array_equal(np.asarray(back.bu), np.asarray(model.bu))
    assert float(back.mu) == pytest.approx(3.2)


def test_cli_bench_smoke(tmp_path):
    rc, out = _run_cli([
        "bench", "--preset", "ml100k_rank16", "--epochs", "1",
        "--no-convergence",
        "--set", "data.dataset=synthetic-small",
        "--set", f"data.root={tmp_path}",
        "--set", "sgd.partitioner=blocked",
        "--set", "sgd.kernel=pallas",
        "--set", "sgd.ublock=128",
        "--set", "sgd.iblock=128",
        "--set", "sgd.tile=64",
    ])
    assert rc == 0
    r = json.loads(out)
    assert r["unit"] == "updates/sec/chip"
    assert r["value"] > 0
    assert "vs_baseline" in r


def test_cli_tune_smoke(tmp_path):
    """Batched lr/reg grid via the CLI: one JSON line per point, exactly
    one flagged best, winning model exported."""
    out_npz = tmp_path / "best.npz"
    rc, out = _run_cli([
        "tune", "--preset", "ml100k_rank16",
        "--set", "sgd.epochs=2",
        "--set", "sgd.batch_size=4096",
        "--set", "data.dataset=synthetic-small",
        "--set", f"data.root={tmp_path}",
        "--lrs", "0.01,0.03", "--regs", "0.02",
        "--out", str(out_npz),
    ])
    assert rc == 0
    rows = [json.loads(line) for line in out.splitlines()]
    assert len(rows) == 2
    assert sum(r["best"] for r in rows) == 1
    assert all(np.isfinite(r["test_rmse"]) for r in rows)
    from mfx.models.mf import MFModel

    best = MFModel.load_npz(out_npz)
    assert best.rank == 16


def test_checkpoint_async_matches_sync(tmp_path):
    """Async per-epoch saves (checkpoint_async=True, the default) must
    leave byte-identical model state to blocking saves — including on the
    blocked path, whose donated epoch buffers make a deferred device read
    unsafe (Orbax snapshots to host before save() returns)."""
    base = [
        "sgd.epochs=2", "sgd.batch_size=4096",
        "sgd.partitioner=blocked", "sgd.kernel=blocked_jnp",
        "data.dataset=synthetic-small", f"data.root={tmp_path}",
        "checkpoint_every=1",
    ]
    cfg_a = apply_overrides(
        preset("ml100k_rank16"),
        base + [f"checkpoint_dir={tmp_path/'async'}", "checkpoint_async=true"],
    )
    cfg_s = apply_overrides(
        preset("ml100k_rank16"),
        base + [f"checkpoint_dir={tmp_path/'sync'}", "checkpoint_async=false"],
    )
    train(cfg_a)
    train(cfg_s)
    for step in (0, 1):
        ma, ea, _ = load_checkpoint(tmp_path / "async", step=step)
        ms, es, _ = load_checkpoint(tmp_path / "sync", step=step)
        assert ea == es == step
        np.testing.assert_array_equal(np.asarray(ma.P), np.asarray(ms.P))
        np.testing.assert_array_equal(np.asarray(ma.Q), np.asarray(ms.Q))
        np.testing.assert_array_equal(np.asarray(ma.bu), np.asarray(ms.bu))


def test_cli_update_online(tmp_path):
    """update: checkpoint + delta npz -> grown model at a new step,
    new-user predictions beating the mu baseline."""
    import numpy as np

    from mfx.data.coo import RatingsCOO
    from mfx.train.checkpoint import latest_step, load_checkpoint

    ckpt = tmp_path / "ckpt"
    rc, _ = _run_cli([
        "train", "--preset", "ml100k_rank16",
        "--set", "sgd.epochs=2",
        "--set", "sgd.partitioner=fixed",
        "--set", "sgd.batch_size=4096",
        "--set", "data.dataset=synthetic-small",
        "--set", f"data.root={tmp_path}",
        "--set", f"checkpoint_dir={ckpt}",
        "--set", "checkpoint_every=1",
    ])
    assert rc == 0
    model, epoch, _ = load_checkpoint(ckpt)
    U, I = model.num_users, model.num_items
    step0 = latest_step(ckpt)

    # delta: 3 brand-new users each rating 12 items highly
    rng = np.random.default_rng(0)
    du = np.repeat(np.arange(U, U + 3, dtype=np.int32), 12)
    di = np.concatenate(
        [rng.permutation(I)[:12] for _ in range(3)]
    ).astype(np.int32)
    delta = RatingsCOO(du, di, np.full(36, 4.5, np.float32),
                       num_users=U + 3, num_items=I)
    delta.save_npz(tmp_path / "delta.npz")
    rc, out = _run_cli([
        "update", "--checkpoint", str(ckpt),
        "--delta", str(tmp_path / "delta.npz"), "--epochs", "1",
    ])
    assert rc == 0
    summary = json.loads(out)
    assert summary["grew_users"] == 3 and summary["grew_items"] == 0
    assert summary["step"] > step0
    new_model, _, _ = load_checkpoint(ckpt)
    assert new_model.num_users == U + 3
    # the folded new users predict their own ratings better than mu
    pred = np.asarray(new_model.predict(du, di))
    mu = float(np.asarray(model.mu))
    assert (np.sqrt(np.mean((pred - 4.5) ** 2))
            < 0.7 * abs(mu - 4.5))
    # old rows unchanged shape-wise; the updated checkpoint still serves
    rc, out = _run_cli([
        "recommend", "--checkpoint", str(ckpt),
        "--users", f"{U},{U + 2}", "--k", "4",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in out.splitlines()]
    assert [l["user"] for l in lines] == [U, U + 2]


def test_cli_blend_exports_single_model(tmp_path):
    """blend: two exported models -> fitted weights JSON + ONE blended
    .npz whose rank is the concatenated sum and which serves/evals."""
    from mfx.models.mf import MFModel

    npzs = []
    for seed, rank in ((0, 4), (1, 8)):
        ckpt = tmp_path / f"ckpt{seed}"
        rc, _ = _run_cli([
            "train", "--preset", "ml100k_rank16",
            "--set", "sgd.epochs=1",
            "--set", "sgd.partitioner=fixed",
            "--set", "sgd.batch_size=4096",
            "--set", f"model.rank={rank}",
            "--set", f"model.seed={seed}",
            "--set", "data.dataset=synthetic-small",
            "--set", f"data.root={tmp_path}",
            "--set", f"checkpoint_dir={ckpt}",
            "--set", "checkpoint_every=1",
        ])
        assert rc == 0
        out_npz = tmp_path / f"m{seed}.npz"
        rc, _ = _run_cli([
            "export", "--checkpoint", str(ckpt), "--out", str(out_npz),
        ])
        assert rc == 0
        npzs.append(str(out_npz))

    blend_npz = tmp_path / "blend.npz"
    rc, out = _run_cli([
        "blend", "--models", ",".join(npzs),
        "--dataset", "synthetic-small", "--root", str(tmp_path),
        "--out", str(blend_npz),
    ])
    assert rc == 0
    summary = json.loads(out)
    assert len(summary["weights"]) == 2
    assert summary["rank"] == 4 + 8
    # the blend fits at least as well as the best member on the val split
    assert (summary["blend_val_rmse"]
            <= min(summary["member_val_rmse"]) + 1e-9)
    blended = MFModel.load_npz(blend_npz)
    assert blended.rank == 12


def test_cli_help_of_every_subcommand():
    """--help of every wired subcommand renders (guards argparse wiring
    regressions — a bad default/flag collision dies at parser build)."""
    import mfx.cli as cli

    parser_cmds = [
        "train", "eval", "bench", "recommend", "similar", "serve",
        "update", "blend", "compress", "export", "tune", "datasets",
        "presets",
    ]
    for cmd in parser_cmds:
        with pytest.raises(SystemExit) as e:
            _run_cli([cmd, "--help"])
        assert e.value.code == 0, cmd


def test_driver_profile_phases_emits_breakdown(tmp_path):
    """cfg.profile_phases: every blocked-SGD epoch record carries
    plan_ms + eval_ms, and the one-time standalone-phase probe fills
    dense_ms/sparse_ms (VERDICT r4 #7 — per-phase attribution lands in
    the JSONL artifact, not ad-hoc experiment logs)."""
    log = tmp_path / "log.jsonl"
    cfg = preset("ml100k_rank16")
    cfg = apply_overrides(cfg, [
        "sgd.epochs=2", "sgd.partitioner=blocked", "sgd.kernel=pallas",
        "sgd.ublock=128", "sgd.iblock=128", "sgd.tile=64",
        "sgd.dense_chi=0.01", "sgd.dense_span=full", "model.rank=64",
        "data.dataset=synthetic-small", f"data.root={tmp_path}",
        f"log_path={log}", "profile_phases=true",
    ])
    res = train(cfg)
    recs = [json.loads(l) for l in log.read_text().splitlines()]
    epochs = [r for r in recs if "epoch" in r and "train_metric" in r]
    assert len(epochs) == 2
    for r in epochs:
        assert "plan_ms" in r and r["plan_ms"] >= 0
        assert "eval_ms" in r and r["eval_ms"] >= 0
        assert r["dense_ms"] >= 0 and r["sparse_ms"] >= 0
    # the probe measured real phases: this config has both dense strata
    # and a sparse remainder
    assert epochs[0]["dense_ms"] > 0
    assert epochs[0]["sparse_ms"] > 0


def test_bench_skew_probe_fields(tmp_path):
    """run_bench(skew_probe=True) must emit the r5 artifact fields: the
    r3-policy anchor and per-skew entries each carrying their own
    within-job speedup_vs_anchor (VERDICT r4 #5/#10), plus the phase
    attribution pair."""
    from mfx.bench import run_bench

    r = run_bench(
        preset="ml100k_rank16",
        epochs=1,
        convergence=False,
        skew_probe=True,
        dataset="synthetic-small",
        overrides=[
            f"data.root={tmp_path}", "sgd.partitioner=blocked",
            "sgd.kernel=pallas", "sgd.ublock=128", "sgd.iblock=128",
            "sgd.tile=64", "model.rank=64", "sgd.dense_span=full",
            "sgd.dense_chi=-1",
        ],
    )
    assert r["value"] > 0
    assert "dense_ms" in r and "sparse_ms" in r
    assert r["dense_spg"] == 1
    spread = r["skew_spread"]
    assert set(spread) == {"user_zipf_0", "user_zipf_0.8"}
    for entry in spread.values():
        assert entry is not None
        assert entry["ups"] > 0
        # per-skew within-job anchor (None only when the headline policy
        # IS the anchor policy, which this config is not)
        assert entry["speedup_vs_anchor"] is not None
        assert entry["speedup_vs_anchor"] > 0
