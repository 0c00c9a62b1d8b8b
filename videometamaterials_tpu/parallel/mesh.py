"""Device mesh and sharding helpers — the L0 substrate.

TPU-native replacement of the reference's torch.distributed(gloo) + Accelerate
stack (SURVEY.md §2.3, §5.8):

  - data parallelism: a 1-D Mesh(('data',)); the training batch carries
    NamedSharding(P('data')), parameters are replicated. The gradient
    all-reduce of DDP (vddp.py:1629) becomes an XLA-inserted psum over ICI —
    no explicit collectives in user code;
  - inference sharding of a conditioning batch (the hand-rolled
    `cond_to_gpu` + broadcast + gather-with-padding dance of
    vddp.py:1506-1532, 1837-1868) becomes: pad the batch to a multiple of the
    device count, device_put with batch sharding, one jitted sample call, and
    slice off the padding — barriers are implicit in SPMD program order;
  - multi-host entry: jax.distributed.initialize() (initialize_distributed()).

Sequence/context parallelism (SURVEY.md §5.7): the reference needs none —
the temporal axis is 11 frames and attention is factorized, so no op sees
more than 11 temporal tokens or 144 spatial tokens at the bottleneck. For
configs that outgrow a chip, the sampling chain supports model-axis
sharding via one constraint on the scan carry
(GaussianDiffusion.sample_spatial_sharding): spatial_video_sharding
partitions the HEIGHT axis (GSPMD conv halo exchanges + attention
collectives — the single-sample latency mode), frame_video_sharding
partitions the FRAME axis (halo-free convs, K/V all-gathers over 'seq' in
temporal attention). Both are parity-tested on the virtual CPU mesh
(tests/test_spatial_sharding.py).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           **kwargs) -> bool:
    """Multi-host bring-up (replaces dist.init_process_group, main.py:31).

    Initializes the JAX distributed runtime when a multi-process context is
    requested — either via explicit arguments or a recognized launcher
    environment (JAX's own coordinator env, SLURM, or a Cloud TPU pod).
    Plain single-process runs are a no-op. Errors during a REQUESTED
    initialization propagate: a half-initialized multi-host job must fail
    loudly rather than silently degrade to one process.

    Returns True iff the distributed runtime was initialized."""
    explicit = any(v is not None
                   for v in (coordinator_address, num_processes, process_id))
    auto = any(k in os.environ for k in (
        "JAX_COORDINATOR_ADDRESS",        # jax's generic launcher contract
        "COORDINATOR_ADDRESS",
        "SLURM_JOB_NUM_NODES",            # cluster schedulers jax can parse
        "TPU_WORKER_HOSTNAMES",           # Cloud TPU pod metadata
    ))
    if not (explicit or auto):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis up to a multiple (repeating the last row so padded
    work is well-conditioned); returns (padded, original_length)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.repeat(x[-1:], rem, axis=0)
    return np.concatenate([x, pad], axis=0), n


def shard_cond_batch(cond: np.ndarray, mesh: Mesh,
                     axis_name: str = "data"):
    """Even device sharding of a conditioning batch for sampling. Returns
    (sharded device array, original length)."""
    n_dev = mesh.devices.size
    padded, n = pad_to_multiple(np.asarray(cond), n_dev)
    arr = jax.device_put(padded, batch_sharding(mesh, axis_name))
    return arr, n


def frame_video_sharding(mesh: Mesh,
                         axis_name: str = "seq") -> NamedSharding:
    """Sequence-parallel sharding (SURVEY.md §5.7): partition the FRAME axis
    of (B, F, H, W, C) video tensors across the mesh. Convs are
    frame-independent (frames fold into batch — no halos at all); temporal
    attention sees all frames, so GSPMD inserts K/V all-gathers over 'seq'.
    At the reference's 11 frames this is never the right trade — it exists
    for long-video configs where the frame axis outgrows a chip. Same usage
    as spatial_video_sharding (GaussianDiffusion.sample_spatial_sharding
    accepts either; the constraint is layout-agnostic)."""
    return NamedSharding(mesh, P(None, axis_name))


def spatial_video_sharding(mesh: Mesh,
                           axis_name: str = "space") -> NamedSharding:
    """Latency-mode sharding: partition the HEIGHT axis of (B, F, H, W, C)
    video tensors across the mesh, so ONE video's denoising chain runs on
    every chip at once (SPMD spatial partitioning). Batch sharding scales
    THROUGHPUT but a single sample still takes the full 256-step chain on
    one chip; height sharding divides the per-step work instead — XLA/GSPMD
    inserts the 3x3-conv halo exchanges (collective-permutes of one-row
    edges) and attention all-gathers over ICI automatically from this one
    annotation. Use via GaussianDiffusion(sample_spatial_sharding=...);
    H must divide by the mesh size (96 = 12 rows x 8 chips flagship)."""
    return NamedSharding(mesh, P(None, None, axis_name))
