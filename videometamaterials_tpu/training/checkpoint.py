"""Checkpoint save/load.

Improves on the reference's end-of-training-only torch.save
(vddp.py:1534-1592, SURVEY.md §5.3/5.4):

  - checkpoints are written at every milestone under the same directory
    contract runs/<name>/model/step_<N>/;
  - backend 'msgpack': single flax-serialized file (simple, portable);
    backend 'orbax': ASYNC Orbax save — the host returns immediately and the
    write overlaps training (wait_for_saves() joins outstanding writes);
  - tolerant restore (strict=False) mirrors the reference's load semantics
    (vddp.py:1563-1592): model/EMA leaves graft where path+shape match with
    warnings for the rest, an optimizer-state mismatch falls back to a fresh
    optimizer ("resuming with new optimizer");
  - keep-latest-N retention (prune_checkpoints) bounds disk use across the
    20 milestones of a paper run.

Auxiliary host-side state (labels_scaling, step) rides along as JSON.
"""

from __future__ import annotations

import json
import shutil
import warnings
from pathlib import Path
from typing import Optional

import jax
import numpy as np
from flax import serialization

_ASYNC_CKPTR = None


def _ckpt_dir(results_folder: str | Path, step: int) -> Path:
    return Path(results_folder) / "model" / f"step_{step}"


def _get_async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Join any outstanding async (orbax) checkpoint writes."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(results_folder: str | Path, step: int, payload: dict,
                    aux: Optional[dict] = None,
                    backend: str = "msgpack",
                    keep_last: Optional[int] = None) -> Path:
    """payload: pytree of arrays {params, ema_params, opt_state, step}.

    With backend='orbax' the save is asynchronous: this returns as soon as
    the arrays are snapshotted to host memory; the directory is committed in
    the background (Orbax writes to a temp dir and renames atomically).
    keep_last: if set, prune all but the newest N step directories after
    saving."""
    import orbax.checkpoint as ocp

    d = _ckpt_dir(results_folder, step)
    primary = jax.process_index() == 0
    if primary:
        d.mkdir(parents=True, exist_ok=True)
    if backend == "orbax":
        # EVERY process must reach these calls: AsyncCheckpointer.save and
        # wait_until_finished run cross-process barriers in a multi-host
        # runtime (a process-0-only call would deadlock the job); Orbax
        # itself writes replicated arrays from the primary host only.
        # Leaves sharded ACROSS processes (not fully addressable — e.g. a
        # tensor-sharded optimizer state) cannot be host-gathered here;
        # they pass through as jax.Arrays and Orbax writes each host's
        # shards directly into the same array file.
        def snapshot(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x
            return np.asarray(jax.device_get(x))

        host_payload = jax.tree.map(snapshot, payload)
        path = d / "orbax"
        ckptr = _get_async_checkpointer()
        # join any in-flight save first: AsyncCheckpointer raises if a new
        # save is issued while another is still writing (possible when the
        # save interval is shorter than the save duration); the wait blocks
        # only until the PREVIOUS write commits, so saves still overlap
        # training between milestones
        ckptr.wait_until_finished()
        ckptr.save(path, args=ocp.args.StandardSave(host_payload),
                   force=True)
    else:
        path = d / "checkpoint.msgpack"
        if primary:
            path.write_bytes(serialization.to_bytes(jax.device_get(payload)))
    if aux is not None and primary:
        (d / "aux.json").write_text(json.dumps(aux))
    if keep_last is not None and primary:
        prune_checkpoints(results_folder, keep_last)
    return path


def _none_to_empty(node):
    if node is None:
        return {}
    if isinstance(node, dict):
        return {k: _none_to_empty(v) for k, v in node.items()}
    return node


def _is_leaf_dict(node) -> bool:
    return not isinstance(node, dict)


def _graft(template, raw, path: str, warn: list):
    """Copy leaves of `raw` onto the structure of `template` wherever the
    path exists and the shape matches; report everything else."""
    if _is_leaf_dict(template) or _is_leaf_dict(raw):
        if _is_leaf_dict(template) != _is_leaf_dict(raw):
            warn.append(f"structure mismatch at {path or '<root>'}")
            return template
        t, r = np.asarray(template), np.asarray(raw)
        if t.shape != r.shape:
            warn.append(f"shape mismatch at {path}: "
                        f"ckpt {r.shape} vs model {t.shape}")
            return template
        return r.astype(t.dtype)
    out = {}
    for k in template:
        if k in raw:
            out[k] = _graft(template[k], raw[k], f"{path}/{k}", warn)
        else:
            warn.append(f"missing in checkpoint: {path}/{k}")
            out[k] = template[k]
    for k in raw:
        if k not in template:
            warn.append(f"unexpected in checkpoint: {path}/{k}")
    return out


def _restore_raw(d: Path, template: dict):
    """Read a checkpoint directory into a raw nested-dict tree (no template
    structure enforcement), auto-detecting the backend."""
    wait_for_saves()       # async orbax dirs commit (rename) on completion
    msgpack_path = d / "checkpoint.msgpack"
    orbax_path = d / "orbax"
    if msgpack_path.exists():
        return serialization.msgpack_restore(msgpack_path.read_bytes())
    if orbax_path.exists():
        import orbax.checkpoint as ocp

        raw = ocp.StandardCheckpointer().restore(orbax_path)

        # in a multi-process runtime orbax restores leaves it saved from
        # cross-process sharded arrays as global jax.Arrays again; gather
        # them so the grafting below always sees host values
        def to_host(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                from jax.experimental import multihost_utils
                return np.asarray(multihost_utils.process_allgather(
                    x, tiled=True))
            return x

        raw = jax.tree.map(to_host, raw)
        # orbax restores sequence nodes as real lists and empty containers
        # (e.g. optax EmptyState) as None; normalize to the msgpack
        # state-dict convention ({'0': ...}, {}) for uniform grafting
        return _none_to_empty(serialization.to_state_dict(raw))
    raise FileNotFoundError(
        f"trainer checkpoint not found at {msgpack_path}. Please check "
        f"path or run load_model_step = None")


def load_checkpoint(results_folder: str | Path, step: int,
                    template: dict,
                    strict: bool = True) -> tuple[dict, Optional[dict]]:
    """Restore into the structure of `template`.

    strict=True: shapes/structure must match exactly (raises otherwise).
    strict=False: reference-load semantics (vddp.py:1563-1592) — params and
    ema_params graft leaf-by-leaf with warnings for mismatches; any
    opt_state discrepancy keeps the fresh optimizer state with a
    'resuming with new optimizer' warning."""
    d = _ckpt_dir(results_folder, step)
    raw = _restore_raw(d, template)

    if strict:
        payload = serialization.from_state_dict(template, raw)

        def _check(t, r):
            if np.shape(t) != np.shape(r):
                raise ValueError(f"shape mismatch: ckpt {np.shape(r)} vs "
                                 f"model {np.shape(t)}")

        jax.tree.map(_check, template, payload)
    else:
        payload = dict(template)
        for section in ("params", "ema_params"):
            if section in template:
                warn: list = []
                payload[section] = _graft(template[section],
                                          raw.get(section, {}),
                                          section, warn)
                for w in warn:
                    warnings.warn(f"checkpoint restore ({section}): {w}",
                                  stacklevel=2)
        if "opt_state" in template:
            warn = []
            grafted = _graft(
                serialization.to_state_dict(template["opt_state"]),
                raw.get("opt_state", {}), "opt_state", warn)
            if warn:
                warnings.warn("resuming with new optimizer "
                              f"({len(warn)} mismatches, e.g. {warn[0]})",
                              stacklevel=2)
            else:
                payload["opt_state"] = serialization.from_state_dict(
                    template["opt_state"], grafted)
        if "step" in raw:
            payload["step"] = raw["step"]

    aux = None
    aux_path = d / "aux.json"
    if aux_path.exists():
        aux = json.loads(aux_path.read_text())
    return payload, aux


def prune_checkpoints(results_folder: str | Path, keep_last: int) -> list:
    """Delete all but the newest `keep_last` checkpoint step directories.
    Returns the list of removed step numbers."""
    wait_for_saves()       # only count committed checkpoints
    model_dir = Path(results_folder) / "model"
    if not model_dir.exists():
        return []
    steps = sorted(s for s in _checkpoint_steps(model_dir))
    removed = []
    for s in steps[:max(0, len(steps) - keep_last)]:
        shutil.rmtree(model_dir / f"step_{s}", ignore_errors=True)
        removed.append(s)
    return removed


def _checkpoint_steps(model_dir: Path):
    for d in model_dir.iterdir():
        if d.is_dir() and d.name.startswith("step_") and \
                ((d / "checkpoint.msgpack").exists()
                 or (d / "orbax").exists()):
            yield int(d.name.split("_")[1])


def latest_checkpoint_step(results_folder: str | Path) -> Optional[int]:
    model_dir = Path(results_folder) / "model"
    if not model_dir.exists():
        return None
    steps = list(_checkpoint_steps(model_dir))
    return max(steps) if steps else None
