"""Device mesh construction and sharding rules.

The reference's only parallelism is single-host ``torch.nn.DataParallel``
(`run_improved_sudormrf.py:118`; SURVEY.md section 2.7). The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over the data axis: batches are
sharded on ``data``, params/optimizer state are replicated, and XLA inserts
the gradient all-reduce over ICI automatically when the jitted train step
computes a mean loss.

A second ``model`` axis is provisioned for tensor-parallel sharding of the
``enc_num_basis``/channel dims on larger configs — the models here are small
(<= 27M params), so the default is model=1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh; defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, ndim=np.ndim(x))), batch
    )


def tp_param_shardings(params, mesh: Mesh, min_size: int = 256):
    """Tensor-parallel sharding rules for a param pytree.

    Shards the leading (output-channel) dim of every large >=2-D param that
    divides the ``model`` axis — for SuDoRM-RF that covers the encoder
    bases, bottleneck, mask head, and decoder (the widest matmuls). XLA
    GSPMD inserts the channel all-gathers/reduces automatically; math is
    unchanged (tested against replicated). Small params stay replicated.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def rule(x):
        shape = np.shape(x)
        if (
            len(shape) >= 2
            and n_model > 1
            and shape[0] % n_model == 0
            and int(np.prod(shape)) >= min_size
        ):
            return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (len(shape) - 1))))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def maybe_distributed_initialize() -> bool:
    """Multi-host entry guard: call ``jax.distributed.initialize`` when the
    standard coordination env vars are set, else no-op.

    The reference has no multi-node path at all (SURVEY.md section 2.7); on
    TPU pods the runtime usually auto-detects, so this only fires when the
    user provides an explicit coordinator (JAX_COORDINATOR_ADDRESS [+
    JAX_NUM_PROCESSES / JAX_PROCESS_ID]). Returns True if initialized.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True
