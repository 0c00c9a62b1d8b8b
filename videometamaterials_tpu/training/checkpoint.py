"""Checkpoint save/load.

Improves on the reference's end-of-training-only torch.save
(vddp.py:1534-1592, SURVEY.md §5.3/5.4): checkpoints are written at every
milestone under the same directory contract runs/<name>/model/step_<N>/,
serialized with flax msgpack (single file, host-side). Auxiliary host-side
state (labels_scaling, step) rides along as JSON. Orbax async checkpointing
is a planned upgrade once milestone cadence becomes IO-bound.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax
from flax import serialization


def _ckpt_dir(results_folder: str | Path, step: int) -> Path:
    return Path(results_folder) / "model" / f"step_{step}"


def save_checkpoint(results_folder: str | Path, step: int, payload: dict,
                    aux: Optional[dict] = None,
                    backend: str = "msgpack") -> Path:
    """payload: pytree of arrays {params, ema_params, opt_state, step}.

    backend 'msgpack': single flax-serialized file (simple, portable).
    backend 'orbax': Orbax StandardCheckpointer directory (async-capable,
    sharding-aware — preferred for large multi-host runs)."""
    import numpy as np

    d = _ckpt_dir(results_folder, step)
    d.mkdir(parents=True, exist_ok=True)
    host_payload = jax.device_get(payload)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        path = d / "orbax"
        host_payload = jax.tree.map(np.asarray, host_payload)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, host_payload, force=True)
        ckptr.wait_until_finished()
    else:
        path = d / "checkpoint.msgpack"
        path.write_bytes(serialization.to_bytes(host_payload))
    if aux is not None:
        (d / "aux.json").write_text(json.dumps(aux))
    return path

def load_checkpoint(results_folder: str | Path, step: int,
                    template: dict) -> tuple[dict, Optional[dict]]:
    """Restore into the structure of `template` (shapes/dtypes must match).
    Auto-detects the backend the checkpoint was written with."""
    import numpy as np

    d = _ckpt_dir(results_folder, step)
    msgpack_path = d / "checkpoint.msgpack"
    orbax_path = d / "orbax"
    if msgpack_path.exists():
        payload = serialization.from_bytes(template,
                                           msgpack_path.read_bytes())
    elif orbax_path.exists():
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(orbax_path,
                                jax.tree.map(np.asarray, template))
    else:
        raise FileNotFoundError(
            f"trainer checkpoint not found at {msgpack_path}. Please check "
            f"path or run load_model_step = None")
    aux = None
    aux_path = d / "aux.json"
    if aux_path.exists():
        aux = json.loads(aux_path.read_text())
    return payload, aux


def latest_checkpoint_step(results_folder: str | Path) -> Optional[int]:
    model_dir = Path(results_folder) / "model"
    if not model_dir.exists():
        return None
    steps = []
    for d in model_dir.iterdir():
        if d.is_dir() and d.name.startswith("step_") and \
                ((d / "checkpoint.msgpack").exists()
                 or (d / "orbax").exists()):
            steps.append(int(d.name.split("_")[1]))
    return max(steps) if steps else None
