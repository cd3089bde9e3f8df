"""Worker process for the multi-process jax.distributed DP test.

Run as: python tests/_distributed_worker.py <process_id> <num_processes> <port>

Each process owns one CPU device; together they form a 2-process data-
parallel mesh coordinated through `parallel.maybe_distributed_initialize`
(the framework's multi-host entry, SURVEY.md section 2.7 DCN row). Each
process feeds its LOCAL half of a deterministic global batch; the trainer
assembles the global array (`Trainer._put_batch` multi-process path) and
runs one donated DP train step. Prints one JSON line with the loss and a
params checksum for the parent test to compare across processes and against
the single-process oracle.
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax

# the axon sitecustomize force-registers the TPU backend; only one process
# could own the chip, so pin every worker to its own CPU backend
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from sudo_rm_rf_tpu import models
from sudo_rm_rf_tpu.parallel import make_mesh, maybe_distributed_initialize
from sudo_rm_rf_tpu.train import Trainer, TrainerConfig


def main():
    assert maybe_distributed_initialize(), "coordinator env vars must fire"
    assert jax.process_count() == nproc, jax.process_count()
    devices = jax.devices()  # global across processes
    assert len(devices) == nproc, devices

    model = models.SuDORMRFImproved(
        out_channels=16, in_channels=32, num_blocks=1, upsampling_depth=2,
        enc_kernel_size=9, enc_num_basis=16, num_sources=2,
    )
    mesh = make_mesh(devices=devices)  # (data=nproc, model=1)
    trainer = Trainer(
        model, TrainerConfig(learning_rate=1e-3),
        prepare_batch=lambda key, b: (b.sum(1, keepdims=True), b),
        mesh=mesh,
    )
    state = trainer.init_state(jax.random.key(0), jnp.zeros((4, 1, 1024)))

    global_batch = np.random.default_rng(42).standard_normal(
        (4, 2, 1024)
    ).astype(np.float32)
    b_local = global_batch.shape[0] // nproc
    local = global_batch[pid * b_local : (pid + 1) * b_local]

    state, metrics = trainer.train_step(state, local, jax.random.key(7))
    loss = float(metrics["loss"])
    checksum = float(
        sum(jnp.sum(jnp.abs(p)) for p in jax.tree.leaves(state.params))
    )
    print(json.dumps({"pid": pid, "loss": loss, "checksum": checksum}),
          flush=True)


if __name__ == "__main__":
    main()
