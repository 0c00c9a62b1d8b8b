"""Worker for tests/test_multihost.py: one of two cooperating processes.

Exercises the real multi-host bring-up path (parallel/mesh.py:
initialize_distributed -> jax.distributed.initialize) plus per-process batch
assembly with jax.make_array_from_process_local_data — the mechanics of
Trainer._put_global (training/trainer.py) — on a 2-process x 2-virtual-CPU
mesh, the JAX analogue of the reference's gloo CPU runs
(/root/reference/main.py:31)."""

import os
import sys


def main():
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")

    from videometamaterials_tpu.parallel.mesh import (
        batch_sharding,
        initialize_distributed,
        make_mesh,
        replicated_sharding,
    )

    ok = initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                                num_processes=2, process_id=pid)
    assert ok, "explicit multi-process request must initialize"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    import jax.numpy as jnp

    d = 5
    global_batch = np.arange(8 * d, dtype=np.float32).reshape(8, d)
    local = global_batch[pid * 4:(pid + 1) * 4]

    mesh = make_mesh()
    bsh = batch_sharding(mesh)
    arr = jax.make_array_from_process_local_data(bsh, local,
                                                 global_batch.shape)

    # a DP-loss-shaped reduction: data-sharded in, replicated scalar out
    # (XLA inserts the cross-process psum)
    fn = jax.jit(lambda a: jnp.mean(a * a), in_shardings=(bsh,),
                 out_shardings=replicated_sharding(mesh))
    val = float(fn(arr))
    with open(os.path.join(outdir, f"out_{pid}.txt"), "w") as f:
        f.write(repr(val))

    # orbax save/restore of a CROSS-PROCESS sharded array: `arr` is not
    # fully addressable on either process (each holds 2 of 4 shards), so
    # save_checkpoint must hand it to Orbax as a jax.Array (each host
    # writes its own shards); restore returns the full array on every host
    from videometamaterials_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_for_saves,
    )

    assert not arr.is_fully_addressable
    run_dir = os.path.join(outdir, "ckpt_run")
    save_checkpoint(run_dir, 7, {"params": {"w": arr}, "step": np.int32(7)},
                    backend="orbax")
    wait_for_saves()
    template = {"params": {"w": np.zeros_like(global_batch)},
                "step": np.int32(0)}
    restored, warn = load_checkpoint(run_dir, 7, template)
    ok = (not warn and int(restored["step"]) == 7
          and np.array_equal(restored["params"]["w"], global_batch))
    with open(os.path.join(outdir, f"ckpt_{pid}.txt"), "w") as f:
        f.write("ok" if ok else f"FAIL warn={warn}")


if __name__ == "__main__":
    main()
