"""Checkpoint/resume via orbax (SURVEY.md §5: the reference has no model
checkpointing — its only resume facility is a processed-file log; plumekit
adds real train-state checkpoints plus a compatible work log for the
identify batch driver)."""

from __future__ import annotations

import os
from typing import Optional

import jax


def _promote_interrupted_swap(ckpt_dir: str) -> None:
    """READ-SAFE half of crash recovery: finish (or roll back) an overwrite
    swap that died between its two renames.

    The swap sequence in :func:`save_checkpoint` is: save ``step_X.tmp`` →
    rename ``step_X`` → ``step_X.old.tmp`` → rename ``step_X.tmp`` →
    ``step_X`` → delete the old. A crash between the renames leaves
    ``tmp`` + ``old`` and no ``path`` — and ``tmp`` is known-complete
    (the first rename only runs after the save), so promoting it is safe
    from ANY process, reader or writer.

    What this deliberately does NOT do: touch a bare ``tmp`` whose ``path``
    still exists. That pattern is ambiguous — a crashed partial save OR a
    live writer's in-flight ``ckptr.save(tmp)`` happening right now — and a
    reader (``predict_model``/``evaluate_model``/``latest_step`` on a live
    training dir) deleting it would crash the trainer's swap and lose the
    new checkpoint. Partial-tmp cleanup belongs to the single writer
    (:func:`save_checkpoint`). The rename here races benignly with the
    writer's own promotion: whoever runs first wins, the loser verifies
    ``path`` exists."""
    import shutil

    if not os.path.isdir(ckpt_dir):
        return
    for name in os.listdir(ckpt_dir):
        if not name.endswith(".old.tmp"):
            continue
        path = os.path.join(ckpt_dir, name[: -len(".old.tmp")])
        tmp, old = path + ".tmp", path + ".old.tmp"
        try:
            if not os.path.exists(path) and os.path.exists(tmp):
                os.rename(tmp, path)
            elif not os.path.exists(path):
                # defensive: the old copy is the only one left — roll back
                os.rename(old, path)
        except OSError:
            if not os.path.exists(path):  # a concurrent recoverer won
                raise
        if os.path.exists(path) and os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)


def _drop_partial_tmps(ckpt_dir: str) -> None:
    """WRITER-ONLY half of crash recovery: remove leftover ``*.tmp``
    entries (partial saves from a previous crashed run). Only the single
    legitimate writer may call this — from a reader it would destroy a
    live trainer's in-flight tmp save (the race the old combined
    ``_recover_swap`` had)."""
    import shutil

    if not os.path.isdir(ckpt_dir):
        return
    for name in os.listdir(ckpt_dir):
        if name.endswith(".tmp"):
            p = os.path.join(ckpt_dir, name)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                # file-typed tmps (e.g. an orphaned model_config.json.tmp):
                # rmtree silently no-ops on files, leaving them forever
                try:
                    os.remove(p)
                except OSError:
                    pass


def save_checkpoint(ckpt_dir: str, state, step: int,
                    overwrite: bool = False) -> None:
    """``overwrite=False`` makes re-saves idempotent (a resumed run hitting
    its own checkpoint); the train loop's final best-state save passes
    ``overwrite=True`` because that step may already hold the degraded
    post-peak state from a regular checkpoint interval."""
    import shutil

    import orbax.checkpoint as ocp

    _promote_interrupted_swap(ckpt_dir)
    _drop_partial_tmps(ckpt_dir)  # we are the writer: safe to clean
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    if os.path.exists(path):
        if not overwrite:
            return
        # never delete the existing checkpoint before the replacement is
        # safely on disk: save to a .tmp sibling (latest_step ignores those),
        # move the old one aside, swap the new one in, then drop the old
        tmp = path + ".tmp"
        old = path + ".old.tmp"
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp, jax.device_get(state))
        os.rename(path, old)
        try:
            os.rename(tmp, path)
        except FileNotFoundError:
            if not os.path.exists(path):   # nobody promoted it for us
                os.rename(old, path)       # roll back, keep the old state
                raise
        shutil.rmtree(old, ignore_errors=True)
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state))


def prune_after(ckpt_dir: str, step: int) -> None:
    """Delete checkpoints with step > ``step`` (early stopping restores the
    dev peak and discards the degraded post-peak interval checkpoints so
    ``latest_step`` — what predict serves and resume continues from — is
    the peak itself, fully self-consistent)."""
    import shutil

    if not os.path.isdir(ckpt_dir):
        return
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_") and not d.endswith(".tmp"):
            if int(d.split("_")[1]) > step:
                shutil.rmtree(os.path.join(ckpt_dir, d))


def save_model_config(ckpt_dir: str, unet_cfg) -> None:
    """Persist the architecture next to its checkpoints
    (``model_config.json``) so serving rebuilds the exact model. Written
    atomically; the train loop calls this once up front."""
    import dataclasses
    import json

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "model_config.json")
    tmp = path + ".tmp"   # latest_step ignores non-step_ names anyway
    with open(tmp, "w") as f:
        json.dump(dataclasses.asdict(unet_cfg), f, indent=1)
    os.replace(tmp, path)


def load_model_config(ckpt_dir: str):
    """The persisted UNetConfig, or ``None`` (pre-round-3 checkpoint dirs
    have no record — callers fall back to the default config, which is the
    only thing those runs could have trained)."""
    import json

    path = os.path.join(ckpt_dir, "model_config.json")
    if not os.path.exists(path):
        return None
    from plumekit.config.train import UNetConfig

    with open(path) as f:
        d = json.load(f)
    known = {f.name for f in __import__("dataclasses").fields(UNetConfig)}
    dropped = set(d) - known
    if dropped:  # forward compatibility: ignore fields newer than this code
        import logging

        logging.getLogger(__name__).warning(
            "model_config.json has unknown fields %s — ignored", dropped)
    return UNetConfig(**{k: v for k, v in d.items() if k in known})


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    _promote_interrupted_swap(ckpt_dir)  # read-safe; never drops tmps
    steps = [
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and not d.endswith(".tmp")
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target, step: Optional[int] = None):
    """Restore into the structure of ``target`` (an abstract or concrete
    state). Returns the restored state, or ``target`` if no checkpoint."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        return target
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


class WorkLog:
    """Atomic processed-item log with the reference's resume semantics
    (``plume_identifier_rg.py:557-568``) minus its a+/read bug
    (``plume_identifier_basic.py:357-359``, SURVEY.md bug #5)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def done(self, item: str) -> bool:
        try:
            with open(self.path) as f:
                # exact line membership: substring containment would report
                # "plume.npz" done after "big_plume.npz" was logged and the
                # suffix granule would be silently skipped forever
                return item in f.read().splitlines()
        except OSError:
            return False

    def items(self) -> set:
        """One snapshot read of every logged item — callers scanning many
        candidates (serve's poll loop) test set membership instead of
        re-reading the file per candidate (O(N²) lines per scan)."""
        try:
            with open(self.path) as f:
                return set(f.read().splitlines())
        except OSError:
            return set()

    def mark(self, item: str) -> None:
        with open(self.path, "a") as f:
            f.write(item + "\n")
            f.flush()
            os.fsync(f.fileno())
