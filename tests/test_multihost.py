"""Two-process multi-host bring-up test (SURVEY.md §5.8).

Spawns a cooperating process pair that initializes the JAX distributed
runtime over a local coordinator, assembles a global batch from per-process
stripes (the Trainer._put_global mechanics), and checks the globally-reduced
result equals the single-process computation — proving the per-host feeding
path the reference covers with gloo CPU runs (/root/reference/main.py:31)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_batch(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    port = _free_port()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"

    d = 5
    global_batch = np.arange(8 * d, dtype=np.float32).reshape(8, d)
    want = float(np.mean(global_batch * global_batch))
    for pid in range(2):
        got = float(open(tmp_path / f"out_{pid}.txt").read())
        assert abs(got - want) < 1e-4, (pid, got, want)
        # cross-process SHARDED orbax save/restore round-tripped on both
        assert open(tmp_path / f"ckpt_{pid}.txt").read() == "ok", pid


def test_two_process_train_ckpt_sample(tmp_path):
    """Full 2-process trainer e2e (VERDICT round-2 item 5): SPMD train
    steps with cross-process gradient psum, BIT-IDENTICAL replicated state
    on both processes, process-0-only checkpoint write + cross-process
    reload, multi-process guided sampling with device all-gather, and the
    masked validation sweep — the whole distributed dance of
    vddp.py:1506-1532,1837-1868 under SPMD."""
    from videometamaterials_tpu.data.synthetic import make_synthetic_dataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_train_worker.py")
    data_dir = tmp_path / "data"
    make_synthetic_dataset(data_dir / "train", 6, 16, 3, seed=0)
    make_synthetic_dataset(data_dir / "val", 3, 16, 3, seed=1)
    port = _free_port()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(data_dir),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    # generous: ~9 min alone on this box, and the suite may run alongside
    # other jobs (the 900 s limit flaked once under CPU contention)
    outs = [p.communicate(timeout=1800)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    import json
    res = [json.load(open(tmp_path / f"out_{pid}.json")) for pid in (0, 1)]
    # replicated training state must be bit-identical across processes
    assert res[0]["state_digest"] == res[1]["state_digest"]
    # both processes reloaded the process-0 checkpoint bit-exactly
    assert res[0]["reload_ok"] and res[1]["reload_ok"]
    # every process holds the SAME full sampled-video tensor
    assert res[0]["videos_digest"] == res[1]["videos_digest"]
    assert res[0]["val_loss"] == res[1]["val_loss"]
    assert np.isfinite(res[0]["val_loss"])
    # the 2-process orbax save completed on both (barrier reached) and
    # the committed directory is visible to both processes
    assert res[0]["orbax_exists"] and res[1]["orbax_exists"]
    # exactly one metrics stream (process 0)
    assert res[0]["metrics_exists"]
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    steps = [json.loads(ln) for ln in lines if "training loss" in ln]
    assert len(steps) == 3


def test_single_process_is_noop(monkeypatch):
    from videometamaterials_tpu.parallel.mesh import initialize_distributed

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "SLURM_JOB_NUM_NODES", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_distributed() is False
