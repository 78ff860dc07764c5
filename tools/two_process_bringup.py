"""Two-process ``jax.distributed`` bring-up on localhost CPU
(VERDICT r3 missing #4 — the DCN wiring must survive a real process
boundary, not just virtual single-process meshes).

Roles (spawned by tests/distributed/test_two_process.py or by hand):

  child N   — one of TWO cooperating processes: ``distributed_init`` to
              a localhost coordinator, global 2-device mesh (one CPU
              device per process), train DSGD ring epochs through the
              REAL ring trainer machinery (mfx/parallel/sharded.py),
              then save the row-sharded checkpoint from both processes
              (Orbax multiprocess, no gather).
  single2   — the reference: same training single-process on 2 VIRTUAL
              devices (the pre-existing test topology), saved to a
              second checkpoint.

The parent test restores both checkpoints and asserts the factor tables
are BITWISE identical: the same ring schedule produces the same bits
whether its two shards live in one process or two.

Inputs are fed as host NumPy arrays (never ``jnp.asarray``): in
multi-controller JAX a committed single-device array cannot be
implicitly resharded across processes, while uncommitted host arrays
are device_put by jit onto the global sharding each process's
addressable half at a time.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train_and_save(mesh, out_dir: str) -> None:
    import numpy as np

    from mfx.config import SGDConfig
    from mfx.data import synthetic
    from mfx.models.mf import MFModel, init_model
    from mfx.parallel.sharded import (
        make_ring_epoch_fn, plan_ring_epoch, shard_model,
    )
    from mfx.data.split import epoch_permutation
    from mfx.train.checkpoint import save_checkpoint

    coo = synthetic.make_synthetic(220, 180, 6_000, rank=4, seed=21)
    cfg = SGDConfig(lr=0.02, reg=0.02, epochs=2, batch_size=256,
                    partitioner="fixed")
    model = init_model(5, 220, 180, 8, global_mean=coo.global_mean)
    # host-numpy model: jit device_puts onto the global mesh sharding
    model = MFModel(
        P=np.asarray(model.P), Q=np.asarray(model.Q),
        bu=np.asarray(model.bu), bi=np.asarray(model.bi),
        mu=np.asarray(model.mu),
    )
    S = mesh.shape["model"]
    padded = shard_model(model, S)
    epoch_fn = make_ring_epoch_fn(mesh, use_bias=True)
    for epoch in range(cfg.epochs):
        perm = epoch_permutation(coo.n_ratings, 0, epoch)
        plan = plan_ring_epoch(coo, S, cfg.batch_size, perm)
        arrays = {
            "users": plan.users, "items": plan.items,
            "ratings": plan.ratings, "weights": plan.weights,
        }
        padded, sse = epoch_fn(
            padded, arrays,
            np.float32(cfg.lr * (cfg.lr_decay**epoch)),
            np.float32(cfg.reg),
        )
    import jax
    import jax.numpy as jnp

    # replicated fingerprint (remote shards are not addressable here)
    fp = jax.jit(lambda x: (jnp.sum(x), jnp.sum(x * x)))(padded.P)
    print(f"fingerprint P: {float(fp[0]):.6f} {float(fp[1]):.6f}",
          flush=True)
    save_checkpoint(out_dir, step=cfg.epochs, model=padded, seed=0)
    print("saved", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", required=True, choices=["child", "single2"])
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    # the axon TPU plugin force-prepends itself to jax_platforms; this
    # bring-up must stay on CPU and never touch the TPU tunnel
    jax.config.update("jax_platforms", "cpu")

    if args.role == "child":
        from mfx.runtime.mesh import distributed_init

        distributed_init(
            coordinator_address=f"localhost:{args.port}",
            num_processes=2,
            process_id=args.process_id,
        )
        assert jax.process_count() == 2, jax.process_count()
        devs = jax.devices()
        assert len(devs) == 2, devs  # one CPU device per process
        assert len(jax.local_devices()) == 1
        from mfx.runtime.mesh import make_mesh

        mesh = make_mesh(model=2)
        print(
            f"process {jax.process_index()}/2 up; global devices={devs}",
            flush=True,
        )
        _train_and_save(mesh, args.out)
    else:
        # reference topology: 2 virtual devices, one process (the parent
        # sets XLA_FLAGS=--xla_force_host_platform_device_count=2)
        from mfx.runtime.mesh import make_mesh

        assert len(jax.devices()) >= 2
        _train_and_save(make_mesh(model=2), args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
