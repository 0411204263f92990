"""Checkpoint / resume / best-model export (Orbax).

Reference: time_tuning.py:460-505 — per-epoch ``{epoch, global_step, model,
optimizer, scheduler}`` torch saves, most-recent-run directory discovery by
sorted timestamp glob, and best-mIoU ``{score}_{epoch}.pth`` exports of the
model state only (:637-641). TPU equivalents: Orbax pytree checkpoints of the
full ``TrainState`` (params, EMA teacher, prototypes, queue, optimizer
moments, step), the same timestamped-run-directory convention, and an
importer for the published PyTorch ``TimeT.pth`` (README.md:66-76 contract).
"""

from __future__ import annotations

import datetime
import logging
import os
import re
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def make_run_directory(base: str) -> str:
    """logs/YYYYMMDD/HHMMSS — the reference's layout (time_tuning.py:555-566)."""
    now = datetime.datetime.now()
    path = os.path.join(base, now.strftime("%Y%m%d"), now.strftime("%H%M%S"))
    os.makedirs(path, exist_ok=True)
    return path


def find_last_run_directory(base: str) -> str | None:
    """Most recent timestamped run dir (reference
    ``find_the_last_logging_directory``, time_tuning.py:473-491)."""
    if not os.path.isdir(base):
        return None
    days = sorted(d for d in os.listdir(base) if re.fullmatch(r"\d{8}", d))
    for day in reversed(days):
        times = sorted(
            t for t in os.listdir(os.path.join(base, day))
            if re.fullmatch(r"\d{6}", t)
        )
        if times:
            return os.path.join(base, day, times[-1])
    return None


def _to_host(x):
    """device → host, handling leaves sharded across non-addressable devices
    (the P('data')-sharded feature queue in multi-host runs: device_get on a
    multi-host array raises, so gather the global value first)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        # tiled=True is REQUIRED for global arrays (allgather raises
        # without it) and returns the fully-replicated global value
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return jax.device_get(x)


def save_checkpoint(state: Any, run_dir: str, epoch: int,
                    meta: dict | None = None) -> str:
    """Write the full TrainState + epoch marker to ``run_dir/checkpoint``.

    ``meta``: small JSON-able dict written as ``checkpoint_meta.json``
    NEXT TO the orbax directory (not inside the payload, so checkpoints
    written before the sidecar existed still restore with the same
    template). The trainer records the queue partition (world size,
    per-device rows) and opt_state layout here — restore uses it to
    detect re-partitioned state exactly instead of by shape heuristics."""
    run_dir = os.path.abspath(run_dir)
    path = os.path.join(run_dir, "checkpoint")
    payload = {"epoch": np.asarray(epoch), "state": jax.tree.map(_to_host, state)}
    ckpt = _checkpointer()
    ckpt.save(path, payload, force=True)
    if meta is not None and jax.process_index() == 0:
        import json

        tmp = os.path.join(run_dir, ".checkpoint_meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(run_dir, "checkpoint_meta.json"))
    return path


def load_checkpoint_meta(run_dir: str) -> dict | None:
    """The ``checkpoint_meta.json`` sidecar, or None (pre-sidecar runs)."""
    p = os.path.join(os.path.abspath(run_dir), "checkpoint_meta.json")
    if not os.path.exists(p):
        return None
    import json

    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def saved_zero1_padding(run_dir: str) -> int | None:
    """The padded length of a saved ZeRO-1 opt_state, read from orbax
    array METADATA (shapes only — no template, no data) — or None when the
    checkpoint is absent, unreadable, or uses a tree opt_state layout.
    Lets the restore path build the exactly-right ZeRO-1 template for a
    checkpoint written at ANY world size instead of probing candidates."""
    path = os.path.join(os.path.abspath(run_dir), "checkpoint")
    if not os.path.exists(path):
        return None
    try:
        tree = _checkpointer().metadata(path).item_metadata.tree
        opt = tree["state"]["opt_state"]
        # Zero1State renders as a dict of its fields; the flat Adam moment
        # vector is 1-D exactly in that layout
        mu = opt["adam"]["mu"]
        shape = tuple(mu.shape)
        return int(shape[0]) if len(shape) == 1 else None
    except Exception:
        return None


def load_checkpoint(run_dir: str, state_template: Any) -> tuple[Any, int]:
    """Restore (state, epoch); returns (template, 0) when absent — matching
    the reference's tolerant resume (time_tuning.py:503-505)."""
    path = os.path.join(os.path.abspath(run_dir), "checkpoint")
    if not os.path.exists(path):
        return state_template, 0
    ckpt = _checkpointer()
    template = {"epoch": np.asarray(0), "state": jax.device_get(state_template)}
    payload = ckpt.restore(path, item=template)
    return payload["state"], int(payload["epoch"])


def _this_process_checkpointer():
    """A checkpointer whose barriers are scoped to THIS process only.

    ``Checkpointer.save`` runs ``sync_global_processes`` barriers that every
    process must join — but ``export_best`` is called on process 0 alone
    (inside the rank-0 eval guard, like the reference's rank-0
    ``model.save``, time_tuning.py:637-641), which would deadlock a pod:
    process 0 parks at the save_start barrier while the other hosts are in
    the training loop. Scoping ``active_processes`` (and ``primary_host``)
    to the calling process makes every barrier a self-sync no-op; the
    on-disk format is the same PyTree layout ``_checkpointer`` reads."""
    import orbax.checkpoint as ocp

    if jax.process_count() == 1:
        return _checkpointer()
    me = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(use_ocdbt=True),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=me,
            active_processes={me},
            barrier_sync_key_prefix=f"export_p{me}",
        ),
    )


def export_best(params: Any, run_dir: str, score: float, epoch: int) -> str:
    """Model-only export named ``{score}_{epoch}`` (time_tuning.py:637-641).

    ViT-backed TimeT trees additionally export a reference-loadable
    ``{score}_{epoch}.pth`` (the published TimeT.pth key layout,
    README.md:66-76) so checkpoints trained here load straight into the
    PyTorch reference; other backbones get the Orbax tree only. Safe to
    call from a single process of a multi-process run (see
    ``_this_process_checkpointer``); ``params`` must be host values or
    process-local arrays there."""
    host = jax.device_get(params)
    path = os.path.join(os.path.abspath(run_dir), f"{score:.4f}_{epoch}")
    _this_process_checkpointer().save(path, host, force=True)
    from timetuning_tpu.models.export_torch import exportable, save_timet_pth

    if exportable(host):
        try:
            save_timet_pth(host, path + ".pth")
        except ImportError:
            # torch is a test-only dependency (pyproject [test] extra); a
            # torch-less production host still gets the Orbax export — the
            # .pth can be produced later from it via models/export_torch
            logging.getLogger("checkpoint").info(
                "torch unavailable — skipped reference-layout .pth export "
                "(Orbax tree written at %s)", path,
            )
    return path


def import_timet_pth(path: str) -> dict:
    """Published PyTorch TimeT checkpoint → flax param tree
    (models/import_torch.timet_params_from_torch)."""
    from timetuning_tpu.models.import_torch import (
        load_torch_state_dict,
        timet_params_from_torch,
    )

    return timet_params_from_torch(load_torch_state_dict(path))
