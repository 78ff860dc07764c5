"""CLI — SURVEY.md A2.

    python -m mfx.cli train --preset ml100k_rank16 [--set sgd.lr=0.02 ...]
    python -m mfx.cli eval  --checkpoint ckpt/ --dataset ml-100k
    python -m mfx.cli bench --preset ml25m_rank64 [--epochs 3]
    python -m mfx.cli datasets | presets
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_config_args(p):
    p.add_argument("--preset", default="ml100k_rank16",
                   help="named config from mfx.config.PRESETS")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="dot-path config override")


def _build_config(args):
    from mfx.config import apply_overrides, preset

    return apply_overrides(preset(args.preset), args.overrides)


def cmd_train(args) -> int:
    from mfx.train.driver import train

    cfg = _build_config(args)
    result = train(cfg, resume=not args.no_resume)
    out = {
        "preset": cfg.name,
        "epochs_run": result.epochs_run,
        "updates_per_sec": result.updates_per_sec,
    }
    if result.test_rmse is not None:
        out["test_rmse"] = result.test_rmse
        out["test_mae"] = result.test_mae
    if result.test_auc is not None:
        out["test_auc"] = result.test_auc
    if result.test_ranking is not None:
        out.update({
            f"test_{n}@{cfg.ranking_k}": round(v, 5)
            for n, v in result.test_ranking.items()
        })
    print(json.dumps(out, sort_keys=True))
    return 0


def cmd_eval(args) -> int:
    from mfx.api import (
        chronological_split, evaluate, leave_one_out_split, load_dataset,
        train_test_split, user_chronological_split,
    )
    from mfx.train.checkpoint import load_checkpoint

    model, epoch, seed = load_checkpoint(args.checkpoint)
    coo = load_dataset(args.dataset, root=args.root)
    if args.split == "loo":
        tr, test = leave_one_out_split(coo, seed=seed)
    elif args.split == "loo-time":
        tr, test = leave_one_out_split(coo, by="time")
    elif args.split == "time":
        tr, test = chronological_split(coo, test_frac=args.test_frac)
    elif args.split == "user-time":
        tr, test = user_chronological_split(coo, test_frac=args.test_frac)
    else:
        tr, test = train_test_split(coo, test_frac=args.test_frac, seed=seed)
    print(json.dumps(
        {
            "checkpoint_epoch": epoch,
            **evaluate(
                model, test, args.implicit,
                ranking_k=args.ranking_k,
                ranking_protocol=args.ranking_protocol,
                train=tr,
            ),
        },
        sort_keys=True,
    ))
    return 0


def cmd_bench(args) -> int:
    from mfx.bench import run_bench

    result = run_bench(preset=args.preset, epochs=args.epochs,
                       overrides=args.overrides,
                       convergence=not args.no_convergence)
    print(json.dumps(result, sort_keys=True))
    return 0


def cmd_recommend(args) -> int:
    """Top-K serving from a checkpoint (mfx/serve) — one JSON line per
    user: dense item ids, scores, and raw dataset ids when the loader
    relabeled items (RatingsCOO.item_raw_ids)."""
    import numpy as np

    from mfx.api import load_dataset
    from mfx.serve import TopKRecommender
    from mfx.train.checkpoint import load_checkpoint

    model, _epoch, _seed = load_checkpoint(args.checkpoint)
    exclude = raw_ids = raw_uids = None
    if args.dataset is not None:
        coo = load_dataset(args.dataset, root=args.root)
        if not args.no_exclude:
            exclude = coo
        raw_ids = coo.item_raw_ids
        raw_uids = coo.user_raw_ids
    users = np.array([int(u) for u in args.users.split(",")], np.int32)
    if args.fused:
        from mfx.serve import FusedTopKRecommender

        if args.recall_target is not None:
            raise SystemExit(
                "--fused has its own selection scheme (drop --recall-target)"
            )
        rec = FusedTopKRecommender(
            model, train=exclude, batch=args.batch,
            table_dtype=args.table_dtype, tile=args.tile,
        )
    else:
        rec = TopKRecommender(
            model, train=exclude, batch=args.batch,
            table_dtype=args.table_dtype, recall_target=args.recall_target,
        )
    items, scores = rec.recommend(users, k=args.k)
    for u, it, sc in zip(users, items, scores):
        out = {
            "user": int(u),
            "items": it.tolist(),
            "scores": [float(s) for s in sc],
        }
        if raw_ids is not None:
            out["raw_items"] = [int(raw_ids[i]) for i in it]
        if raw_uids is not None:
            # users are activity-relabeled at load (generator v6);
            # report the dataset's raw user id alongside the dense one
            out["raw_user"] = int(raw_uids[u])
        print(json.dumps(out))
    return 0


def cmd_similar(args) -> int:
    """Related-items serving from a checkpoint: top-K nearest items by
    factor cosine — one JSON line per query item."""
    import numpy as np

    from mfx.serve import similar_items
    from mfx.train.checkpoint import load_checkpoint

    model, _epoch, _seed = load_checkpoint(args.checkpoint)
    raw_ids = None
    if args.dataset is not None:
        from mfx.api import load_dataset

        raw_ids = load_dataset(args.dataset, root=args.root).item_raw_ids
    items = np.array([int(i) for i in args.items.split(",")], np.int32)
    if args.fused:
        from mfx.serve import similar_items_fused

        nbrs, cos = similar_items_fused(
            model, items, k=args.k, batch=args.batch
        )
    else:
        nbrs, cos = similar_items(model, items, k=args.k, batch=args.batch)
    for q, it, sc in zip(items, nbrs, cos):
        out = {
            "item": int(q),
            "similar": it.tolist(),
            "cosine": [float(s) for s in sc],
        }
        if raw_ids is not None:
            out["raw_item"] = int(raw_ids[q])
            out["raw_similar"] = [int(raw_ids[i]) for i in it]
        print(json.dumps(out))
    return 0


def cmd_tune(args) -> int:
    """Batched hyperparameter sweep: every (lr, reg) grid point trains
    simultaneously in ONE vmapped program (mfx.tune). Prints one JSON
    line per point plus the winner."""
    from mfx.api import (
        chronological_split, load_dataset, train_test_split,
        user_chronological_split,
    )
    from mfx.tune import sweep_sgd

    cfg = _build_config(args)
    coo = load_dataset(cfg.data.dataset, root=cfg.data.root)
    # honor the configured held-out protocol (same dispatch as train())
    if cfg.data.split == "time":
        train, test = chronological_split(coo, cfg.data.test_frac)
    elif cfg.data.split == "user-time":
        train, test = user_chronological_split(coo, cfg.data.test_frac)
    else:
        train, test = train_test_split(
            coo, test_frac=cfg.data.test_frac, seed=cfg.data.seed
        )
    lrs = [float(x) for x in args.lrs.split(",")]
    regs = [float(x) for x in args.regs.split(",")]
    clip = (0.5, 5.0) if cfg.clip_predictions else None
    res = sweep_sgd(
        train, test, cfg.sgd, rank=cfg.model.rank, lrs=lrs, regs=regs,
        use_bias=cfg.model.use_bias, seed=cfg.model.seed, clip=clip,
    )
    for h, p in enumerate(res.points):
        print(json.dumps({**p, "best": h == res.best_index}, sort_keys=True))
    if args.out is not None:
        res.model.save_npz(args.out)
    return 0


def cmd_serve(args) -> int:
    """Run the HTTP serving endpoint (mfx/serve/server.py) over a
    checkpoint: POST /recommend, /similar, /recommend_cold, /reload,
    GET /healthz, /metrics. POST /reload re-reads the NEWEST checkpoint
    step and hot-swaps it in — a training/update job's saves go live
    without a serving restart."""
    import functools

    from mfx.serve import (
        TopKRecommender, similar_items, similar_items_fused,
    )
    from mfx.serve.server import RecServer
    from mfx.train.checkpoint import load_checkpoint

    exclude = raw_ids = None
    if args.dataset is not None:
        from mfx.api import load_dataset

        coo = load_dataset(args.dataset, root=args.root)
        if not args.no_exclude:
            exclude = coo
        raw_ids = coo.item_raw_ids

    def build() -> dict:
        model, epoch, _seed = load_checkpoint(args.checkpoint)
        # 'mfx update' grows the tables past the dataset's id space:
        # widen the exclusion COO's declared shape (so its CSR covers
        # the new users) and extend the raw-id map with identity for
        # new dense ids, or serving 500s on any grown row
        exclude_b, raw_b = exclude, raw_ids
        if exclude is not None and (
            model.num_users > exclude.num_users
            or model.num_items > exclude.num_items
        ):
            import dataclasses

            exclude_b = dataclasses.replace(
                exclude,
                num_users=max(model.num_users, exclude.num_users),
                num_items=max(model.num_items, exclude.num_items),
            )
        if raw_b is not None and model.num_items > len(raw_b):
            import numpy as np

            raw_b = np.concatenate([
                raw_b,
                np.arange(len(raw_b), model.num_items, dtype=raw_b.dtype),
            ])
        if args.fused:
            from mfx.serve import FusedTopKRecommender

            if args.recall_target is not None:
                raise SystemExit(
                    "--fused has its own selection scheme "
                    "(drop --recall-target)"
                )
            rec = FusedTopKRecommender(
                model, train=exclude_b, batch=args.batch,
                table_dtype=args.table_dtype, tile=args.tile,
                exact=args.fused_exact, exact_tiles=args.exact_tiles,
                exact_depth=args.exact_depth,
            )
            sim = functools.partial(
                similar_items_fused, model, tile=args.tile,
                exact=args.fused_exact, exact_tiles=args.exact_tiles,
                exact_depth=args.exact_depth,
            )
        else:
            rec = TopKRecommender(
                model, train=exclude_b, batch=args.batch,
                table_dtype=args.table_dtype,
                recall_target=args.recall_target,
            )
            sim = functools.partial(similar_items, model)
        if args.mmr is not None:
            from mfx.serve import MMRRecommender

            rec = MMRRecommender(rec, model=model, lam=args.mmr,
                                 pool=args.mmr_pool)
        from mfx.serve import recommend_cold

        cold = functools.partial(
            recommend_cold, model, reg=args.foldin_reg
        )
        return {
            "recommender": rec,
            "similar": lambda q, k: sim(q, k=k),
            "cold": lambda hs, k: cold(hs, k=k),
            "raw_item_ids": raw_b,
            "info": {"checkpoint_epoch": epoch},
        }

    first = build()
    srv = RecServer(
        first["recommender"], similar=first["similar"],
        cold=first["cold"], raw_item_ids=first["raw_item_ids"],
        reload=build, host=args.host, port=args.port,
    )
    model = first["recommender"].model
    print(json.dumps({
        "serving": f"http://{args.host}:{srv.port}",
        "recommender": type(first["recommender"]).__name__,
        "num_users": model.num_users, "num_items": model.num_items,
    }), flush=True)
    srv.serve_forever()
    return 0


def cmd_export(args) -> int:
    """Checkpoint -> portable .npz model artifact (orbax-free serving)."""
    from mfx.train.checkpoint import load_checkpoint

    model, epoch, _seed = load_checkpoint(args.checkpoint)
    model.save_npz(args.out)
    print(json.dumps({
        "out": args.out, "checkpoint_epoch": epoch,
        "num_users": model.num_users, "num_items": model.num_items,
        "rank": model.rank,
    }, sort_keys=True))
    return 0


def cmd_update(args) -> int:
    """Online update: checkpoint + delta-ratings .npz -> new checkpoint
    step (grow tables for new ids, fold-in init, a few SGD epochs over
    the delta — mfx.train.online.partial_fit; no full retrain)."""
    from mfx.config import SGDConfig
    from mfx.data.coo import RatingsCOO
    from mfx.train.checkpoint import (
        latest_step, load_checkpoint, save_checkpoint,
    )
    from mfx.train.online import partial_fit

    model, epoch, seed = load_checkpoint(args.checkpoint)
    delta = RatingsCOO.load_npz(args.delta)
    replay = (RatingsCOO.load_npz(args.replay)
              if args.replay is not None else None)
    old_shape = (model.num_users, model.num_items)
    cfg = SGDConfig(
        lr=args.lr, reg=args.reg, epochs=args.epochs,
        batch_size=args.batch_size, partitioner="fixed",
        dup_trust=args.dup_trust,
    )
    model, tr = partial_fit(
        model, delta, cfg, seed=seed,
        foldin_new=not args.no_foldin, foldin_reg=args.foldin_reg,
        replay=replay,
    )
    out_dir = args.out if args.out is not None else args.checkpoint
    step = (latest_step(out_dir) or epoch) + 1
    save_checkpoint(out_dir, step, model, seed=seed)
    print(json.dumps({
        "checkpoint": str(out_dir), "step": step,
        "delta_ratings": delta.n_ratings,
        "grew_users": model.num_users - old_shape[0],
        "grew_items": model.num_items - old_shape[1],
        "train_rmse": None if tr != tr else round(tr, 6),
    }, sort_keys=True))
    return 0


def cmd_blend(args) -> int:
    """Ridge-blend exported .npz models on a validation split and write
    the blend as ONE concatenated-factor .npz (mfx.models.ensemble) —
    it serves through every existing path unchanged."""
    from mfx.api import load_dataset
    from mfx.data.split import train_test_split
    from mfx.models.ensemble import blend_as_mf, fit_blend
    from mfx.models.mf import MFModel

    paths = [p for p in args.models.split(",") if p]
    if len(paths) < 2:
        raise SystemExit("--models needs >= 2 comma-separated .npz paths")
    models = [MFModel.load_npz(p) for p in paths]
    coo = load_dataset(args.dataset, root=args.root)
    _train, val = train_test_split(
        coo, test_frac=args.val_frac, seed=args.seed
    )
    res = fit_blend(models, val, reg=args.reg)
    out = {
        "models": paths,
        "weights": [round(float(w), 6) for w in res.weights],
        "intercept": round(res.intercept, 6),
        "member_val_rmse": [round(float(r), 6) for r in res.member_rmse],
        "blend_val_rmse": round(res.val_rmse, 6),
    }
    if args.out is not None:
        blend = blend_as_mf(models, res.weights, res.intercept)
        blend.save_npz(args.out)
        out["out"] = args.out
        out["rank"] = blend.rank
    print(json.dumps(out, sort_keys=True))
    return 0


def cmd_compress(args) -> int:
    """Distill an .npz model to a smaller rank (optimal truncation —
    mfx.models.compress). Pairs with 'blend' (blend rank = Σ members)."""
    from mfx.models.compress import compress_model
    from mfx.models.mf import MFModel

    model = MFModel.load_npz(args.model)
    res = compress_model(model, args.rank)
    res.model.save_npz(args.out)
    print(json.dumps({
        "out": args.out, "rank": args.rank, "from_rank": model.rank,
        "energy": round(res.energy, 6),
        "singular_values": [
            round(float(s), 6) for s in res.singular_values
        ],
    }, sort_keys=True))
    return 0


def cmd_datasets(args) -> int:
    from mfx.data.loaders import dataset_names

    print("\n".join(dataset_names()))
    return 0


def cmd_presets(args) -> int:
    from mfx.config import PRESETS

    for name, cfg in sorted(PRESETS.items()):
        print(f"{name}: solver={cfg.solver} dataset={cfg.data.dataset} "
              f"rank={cfg.model.rank} parallel={cfg.parallel.mode}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="mfx", description="TPU-native matrix factorization"
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train a preset config")
    _add_config_args(p)
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing checkpoints")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="evaluate a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--root", default=None, help="dataset root directory")
    p.add_argument("--test-frac", type=float, default=0.1)
    p.add_argument("--implicit", action="store_true")
    p.add_argument("--split",
                   choices=("uniform", "loo", "time", "user-time",
                            "loo-time"),
                   default="uniform",
                   help="held-out protocol: uniform fraction, "
                        "leave-one-out (the ranking-eval standard), "
                        "global chronological cut (train past / test "
                        "future), per-user timeline cut (each user's "
                        "last fraction), or per-user latest-item "
                        "leave-one-out (the time protocols need a "
                        "dataset with timestamps)")
    p.add_argument("--ranking-k", type=int, default=None,
                   help="also report HR/NDCG/MRR at this K")
    p.add_argument("--ranking-protocol",
                   choices=("sampled", "full", "user"),
                   default="sampled",
                   help="rank vs 100 sampled candidates (NCF-style), "
                        "the full catalog (bias-free), or per-user "
                        "Recall/Precision/NDCG/MAP + coverage/novelty "
                        "over the served top-K lists")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("bench", help="measure updates/sec/chip")
    _add_config_args(p)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--no-convergence", action="store_true",
                   help="skip the epochs-to-target probe and the "
                        "replanning steady-state measurement")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("recommend", help="top-K items from a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--users", required=True,
                   help="comma-separated dense user ids")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--dataset", default=None,
                   help="dataset whose interactions are excluded from "
                        "results (and whose raw item-id map is reported)")
    p.add_argument("--root", default=None, help="dataset root directory")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--no-exclude", action="store_true",
                   help="keep already-seen items in the results")
    p.add_argument("--table-dtype", choices=("f32", "bf16", "int8"),
                   default="f32",
                   help="serving-table precision: bf16 halves / int8 "
                        "quarters the tables' HBM footprint (quality "
                        "bounds tested; see docs/SERVING.md)")
    p.add_argument("--recall-target", type=float, default=None,
                   help="approximate top-K via TPU approx_max_k with "
                        "this per-item recall (e.g. 0.95); default exact")
    p.add_argument("--fused", action="store_true",
                   help="score-block-free Pallas serving (chip-measured "
                        "28.9x vs exact at a 1M-item catalog, ~0.998 "
                        "recall@100; see docs/SERVING.md)")
    p.add_argument("--tile", type=int, default=1024,
                   help="fused path: catalog items per kernel step")
    p.set_defaults(fn=cmd_recommend)

    p = sub.add_parser("similar", help="related items from a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--items", required=True,
                   help="comma-separated dense item ids")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--dataset", default=None,
                   help="dataset whose raw item-id map is reported")
    p.add_argument("--root", default=None, help="dataset root directory")
    p.add_argument("--fused", action="store_true",
                   help="score-block-free Pallas related-items path")
    p.set_defaults(fn=cmd_similar)

    p = sub.add_parser("tune", help="batched lr/reg grid search (vmap)")
    _add_config_args(p)
    p.add_argument("--lrs", required=True,
                   help="comma-separated learning rates")
    p.add_argument("--regs", required=True,
                   help="comma-separated L2 strengths")
    p.add_argument("--out", default=None,
                   help="save the winning model as .npz")
    p.set_defaults(fn=cmd_tune)

    p = sub.add_parser("serve", help="HTTP serving endpoint over a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--dataset", default=None,
                   help="dataset whose interactions are excluded from "
                        "results (and whose raw item-id map is reported)")
    p.add_argument("--root", default=None, help="dataset root directory")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--no-exclude", action="store_true")
    p.add_argument("--table-dtype", choices=("f32", "bf16", "int8"),
                   default="f32")
    p.add_argument("--recall-target", type=float, default=None)
    p.add_argument("--fused", action="store_true",
                   help="score-block-free Pallas serving path")
    p.add_argument("--fused-exact", action="store_true",
                   help="certified-exact fused serving (suspect-tile "
                        "rescore; falls back to the stock scorer when "
                        "the union overflows --exact-tiles)")
    p.add_argument("--exact-tiles", type=int, default=64)
    p.add_argument("--exact-depth", type=int, default=8,
                   help="per-tile selection depth in exact mode (a tile "
                        "is suspect only when more than this many of a "
                        "user's top-K collide in it)")
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--foldin-reg", type=float, default=0.05,
                   help="L2 of the cold-start fold-in solve "
                        "(/recommend_cold)")
    p.add_argument("--mmr", type=float, default=None,
                   help="diversify /recommend lists by greedy MMR with "
                        "this relevance weight in [0,1] (1 = pure "
                        "relevance); over-fetches --mmr-pool x k")
    p.add_argument("--mmr-pool", type=int, default=4)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "update",
        help="online update: absorb a delta-ratings .npz into a "
             "checkpoint (grow + fold-in + a few SGD epochs)",
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--delta", required=True,
                   help="RatingsCOO .npz of the new ratings "
                        "(ids may exceed the model's tables)")
    p.add_argument("--replay", default=None,
                   help="optional RatingsCOO .npz of old ratings to "
                        "train alongside the delta (rehearsal)")
    p.add_argument("--out", default=None,
                   help="checkpoint dir for the updated step "
                        "(default: append to --checkpoint)")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--reg", type=float, default=0.02)
    p.add_argument("--batch-size", type=int, default=8192)
    p.add_argument("--dup-trust", type=float, default=16.0)
    p.add_argument("--foldin-reg", type=float, default=0.05)
    p.add_argument("--no-foldin", action="store_true",
                   help="skip least-squares init of new rows")
    p.set_defaults(fn=cmd_update)

    p = sub.add_parser(
        "blend",
        help="ridge-blend exported .npz models on a validation split; "
             "optionally write the exact single-model blend .npz",
    )
    p.add_argument("--models", required=True,
                   help="comma-separated .npz model paths (use 'export' "
                        "to produce them from checkpoints)")
    p.add_argument("--dataset", required=True)
    p.add_argument("--root", default=None)
    p.add_argument("--val-frac", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0,
                   help="validation-split seed — use a split the members "
                        "did NOT train on")
    p.add_argument("--reg", type=float, default=1e-4)
    p.add_argument("--out", default=None,
                   help="write the blended model as one .npz")
    p.set_defaults(fn=cmd_blend)

    p = sub.add_parser(
        "compress",
        help="distill an .npz model to a smaller rank "
             "(optimal SVD truncation of P·Q^T)",
    )
    p.add_argument("--model", required=True, help=".npz model path")
    p.add_argument("--rank", type=int, required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_compress)

    p = sub.add_parser("export", help="checkpoint -> portable .npz model")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True, help="output .npz path")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("datasets", help="list known datasets")
    p.set_defaults(fn=cmd_datasets)

    p = sub.add_parser("presets", help="list named configs")
    p.set_defaults(fn=cmd_presets)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
