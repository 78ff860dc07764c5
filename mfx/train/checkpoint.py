"""Checkpoint/resume — SURVEY.md T2.

Orbax-backed pytree checkpoints (sharded-array aware, so row-sharded
tables on a mesh save/restore without gathering), with a plain ``.npz``
fallback when Orbax is unavailable. Layout: ``<dir>/<step>/`` per epoch;
``latest_step`` finds the resume point. Checkpointed state:
{P, Q, bu, bi, mu, epoch, seed} — everything needed for a bitwise resume
(the per-epoch RNG streams are derived from (seed, epoch), so no RNG state
needs saving; see mfx.data.split.epoch_permutation).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mfx.data.loaders import GENERATOR_VERSION
from mfx.models.mf import MFModel

__all__ = [
    "save_checkpoint", "load_checkpoint", "latest_step",
    "wait_for_checkpoints",
]

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

# one long-lived checkpointer so async saves can outlive the call that
# scheduled them (Orbax's StandardCheckpointer is an AsyncCheckpointer:
# save() snapshots device arrays to host synchronously, then writes in a
# background thread — so donated/overwritten buffers in the next epoch
# can't race the write)
_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until every async save scheduled so far is durably on disk."""
    if _HAVE_ORBAX and _CKPTR is not None:
        _CKPTR.wait_until_finished()


def _state_dict(model: MFModel, epoch: int, seed: int) -> dict:
    state = {
        "P": model.P,
        "Q": model.Q,
        "bu": model.bu,
        "bi": model.bi,
        "mu": model.mu,
        "epoch": jnp.asarray(epoch, jnp.int32),
        "seed": jnp.asarray(seed, jnp.int32),
        # Pin of the dataset generator/relabel scheme this model's dense
        # user/item ids were trained under (mfx.data.loaders
        # GENERATOR_VERSION — v6 relabeled BOTH axes by frequency, so a
        # pre-v6 model's row indices silently mismatch a re-parsed
        # dataset). load_checkpoint warns loudly on mismatch.
        "data_version": jnp.asarray(GENERATOR_VERSION, jnp.int32),
    }
    if jax.process_count() > 1:
        # multi-controller: Orbax refuses host-local jax.Arrays (a
        # SingleDeviceSharding names a process-local device other
        # processes cannot see). Scalars and any unsharded leaves become
        # GLOBAL fully-replicated arrays on an all-devices mesh; the
        # row-sharded tables already carry global NamedShardings from
        # the shard_map program (tools/two_process_bringup.py drives
        # this path end-to-end).
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        rep = NamedSharding(
            Mesh(np.array(jax.devices()), ("all",)), PartitionSpec()
        )

        def _globalize(x):
            if (
                isinstance(x, jax.Array)
                and x.is_fully_addressable
                and len(x.sharding.device_set) < len(jax.devices())
            ):
                return jax.device_put(np.asarray(x), rep)
            return x

        state = {k: _globalize(v) for k, v in state.items()}
    return state


def save_checkpoint(
    ckpt_dir, step: int, model: MFModel, seed: int = 0, block: bool = True
) -> str:
    """``block=False`` schedules an async save and returns as soon as the
    arrays are snapshotted to host — the disk write overlaps the next
    epoch's device work (the host is often the slow side here). Call
    :func:`wait_for_checkpoints` before relying on the files; the training
    driver flushes at the end of train()."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"{step}"
    state = _state_dict(model, step, seed)
    if _HAVE_ORBAX:
        ckptr = _checkpointer()
        ckptr.wait_until_finished()  # serialize with any in-flight save
        ckptr.save(path, state, force=True)
        if block:
            ckptr.wait_until_finished()
    else:  # pragma: no cover
        np.savez(str(path) + ".npz", **{k: np.asarray(v) for k, v in state.items()})
    return str(path)


def latest_step(ckpt_dir) -> int | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = []
    for p in ckpt_dir.iterdir():
        name = p.name.removesuffix(".npz")
        if name.isdigit():
            steps.append(int(name))
    return max(steps) if steps else None


def load_checkpoint(
    ckpt_dir, step: int | None = None, shardings=None
) -> tuple[MFModel, int, int]:
    """Returns (model, epoch, seed). Raises FileNotFoundError if absent.

    Sharded tables restore WITHOUT gathering: Orbax records each array's
    ``NamedSharding`` at save time and re-materializes per-device shards on
    restore (tested in tests/distributed/test_sharded_checkpoint.py). Pass
    ``shardings`` — a dict mapping state keys (``P``, ``Q``, ``bu``,
    ``bi``) to target shardings, or a callable ``(key, shape, dtype) ->
    Sharding | None`` — to restore onto a different topology than the one
    that saved (restoring without it replays the SAVED shardings, which
    Orbax cannot rebuild on a different device count)."""
    wait_for_checkpoints()  # never read a checkpoint mid-write
    ckpt_dir = Path(ckpt_dir).absolute()
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = ckpt_dir / f"{step}"
    if _HAVE_ORBAX and path.exists():
        ckptr = ocp.StandardCheckpointer()
        if shardings is not None:
            meta = ckptr.metadata(path).item_metadata.tree
            get = shardings if callable(shardings) else (
                lambda k, shape, dtype: shardings.get(k)
            )
            abstract = {
                k: jax.ShapeDtypeStruct(
                    tuple(m.shape), m.dtype,
                    sharding=get(k, tuple(m.shape), m.dtype),
                )
                for k, m in meta.items()
            }
            state = ckptr.restore(path, abstract)
        else:
            state = ckptr.restore(path)
    else:  # pragma: no cover
        with np.load(str(path) + ".npz") as z:
            state = {k: z[k] for k in z.files}

    saved_ver = int(state.get("data_version", 0)) or None
    if saved_ver != GENERATOR_VERSION:
        import warnings

        warnings.warn(
            f"checkpoint {path} was trained under dataset generator "
            f"version {saved_ver or '<pre-v6 (unstamped)>'} but this "
            f"build parses datasets at version {GENERATOR_VERSION}; "
            "dense user/item ids are frequency-relabeled per version, so "
            "serving/eval against a re-parsed dataset may index the "
            "WRONG rows. Re-train, or evaluate against the npz cache "
            "written by the same version.",
            stacklevel=2,
        )

    def _keep(x):  # preserve restored device shardings
        return x if isinstance(x, jax.Array) else jnp.asarray(x)

    model = MFModel(
        P=_keep(state["P"]),
        Q=_keep(state["Q"]),
        bu=_keep(state["bu"]),
        bi=_keep(state["bi"]),
        mu=_keep(state["mu"]),
    )
    return model, int(state["epoch"]), int(state["seed"])
