"""Generic trainer: the reference's six runner scripts as one configurable loop.

The reference runners (`run_improved_sudormrf.py`, `run_sudormrf_gc_v2.py`,
`run_fuss_separation.py`, ...) share one skeleton — augment, forward,
optional mixture consistency, clamped PIT loss, grad-clip, Adam, stepped LR
decay (SURVEY.md section 2.5). Here those degrees of freedom are config
fields; the step itself is a single jitted, donated, mesh-sharded function.

TPU-native structure:
  * params/opt state replicated, batch sharded over the ``data`` mesh axis;
    XLA inserts the ICI all-reduce for the mean-loss gradients.
  * augmentation runs on-device inside the same jit (explicit RNG keys).
  * the loss clamp matches the reference exactly: the *loss value* is
    clipped, so gradients vanish when |loss| saturates
    (`run_improved_sudormrf.py:169-171`).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sudo_rm_rf_tpu import losses as losses_lib
from sudo_rm_rf_tpu.parallel.mesh import DATA_AXIS, make_mesh
from sudo_rm_rf_tpu.train import augment as augment_lib


def donation_ok(mesh: Optional[Mesh] = None) -> bool:
    """Whether jit buffer donation is safe to use for train-state updates.

    Donation is the right default on real hardware (in-place state update,
    no copy). But through a remote device *relay* (the axon tunnel used in
    proxied single-chip setups) every donated argument buffer pays a large
    fixed per-dispatch cost: measured 88.6 s vs 1.25 s for the identical
    25-step chained U16/512 train program (~0.1 s x ~800 state buffers).
    There the copy is far cheaper than the donation bookkeeping.

    Auto-detection keys on the PJRT client's platform_version string, which
    the relay prefixes with its plugin name ('axon ...'); a real local
    TPU/CPU/GPU client never does. Override with SUDO_TPU_DONATE=0/1.
    """
    env = os.environ.get("SUDO_TPU_DONATE", "auto").strip().lower()
    if env in ("0", "false", "off", "no"):
        return False
    if env in ("1", "true", "on", "yes"):
        return True
    try:
        dev = (
            next(iter(mesh.devices.flat)) if mesh is not None else jax.devices()[0]
        )
        version = dev.client.platform_version
    except Exception:
        return True
    return "axon" not in version.lower()


def stepped_lr_schedule(
    learning_rate: float,
    divide_lr_by: float,
    patience_epochs: int,
    steps_per_epoch: int,
    epoch_end_phase: bool = False,
):
    """lr / divide_lr_by ** (epoch // patience) (`run_improved_sudormrf.py:179-186`).

    epoch_end_phase=True reproduces the reference's exact decay *phase*: the
    reference checks ``tr_step % patience`` at the END of each epoch and the
    new LR only takes effect the FOLLOWING epoch (`run_improved_sudormrf.py:
    179-187`, tr_step increments after the update), so epoch e (0-based)
    trains at lr / div ** max(0, (e-1) // patience) — one epoch later than
    the epoch-start phase this framework uses by default.
    """

    def schedule(step):
        if patience_epochs <= 0:
            return learning_rate
        epoch = step // max(steps_per_epoch, 1)
        if epoch_end_phase:
            exponent = jnp.maximum(0, (epoch - 1) // patience_epochs)
        else:
            exponent = epoch // patience_epochs
        return learning_rate / (divide_lr_by**exponent)

    return schedule


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


@dataclass(frozen=True)
class TrainerConfig:
    learning_rate: float = 1e-3
    divide_lr_by: float = 3.0
    patience_epochs: int = 0  # 0 = constant LR
    steps_per_epoch: int = 1
    clip_grad_norm: float = 5.0
    loss_clamp: float = 30.0  # 0 disables; reference uses 30 (50 for WHAMR)
    # reference-exact LR decay phase (decays take effect one epoch later,
    # matching run_improved_sudormrf.py:179-187); see stepped_lr_schedule.
    lr_decay_at_epoch_end: bool = False
    mixture_consistency: Optional[str] = None  # None | 'uniform' | 'magsq'
    # 'adam' (SuDo runners) or 'radam_cosine' (baseline_runner.py:112-127:
    # RAdam + linear warmup + cosine annealing)
    optimizer: str = "adam"
    warmup_steps: int = 1000
    total_steps: int = 100_000
    # mixed precision: forward/backward in this dtype, fp32 master params,
    # optimizer updates and the PIT loss always in fp32. None = full fp32.
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16'
    # gradient accumulation: split each batch into this many microbatches
    # inside the jitted step (lax.scan), averaging gradients — large
    # effective batches beyond device memory. Augmentation still draws over
    # the FULL batch first, so accumulated == large-batch numerics (the
    # loss clamp applies per microbatch; equal whenever the clamp is
    # inactive). 1 = off.
    grad_accum_steps: int = 1
    # tensor parallelism: shard large params' output-channel dims over the
    # mesh 'model' axis (parallel.tp_param_shardings). No-op on model=1.
    shard_params: bool = False
    # train-time dropout: pass deterministic=False plus a 'dropout' RNG to
    # model.apply inside the train step (the attentive zoo's Dropout layers;
    # reference trains them in torch train mode, `attentive_sudormrf.py`).
    # Off by default — models without a `deterministic` kwarg don't accept it.
    train_dropout: bool = False
    # host->device batch transfer dtype: batches are cast host-side before
    # upload and upcast back to fp32 as the first op of the jitted step, so
    # the ONLY numerics change is waveform quantization at the transfer
    # boundary (bf16: ~8 mantissa bits ~ 40 dB SNR on raw audio). Halves
    # H2D bytes — matters through a remote relay (~1 GB/s measured) and for
    # DCN-fed pods; None = upload as-is (fp32).
    upload_dtype: Optional[str] = None


def _default_loss(est, targets):
    return losses_lib.pit_neg_sdr_loss(est, targets, sdr_type="sisdr")


class Trainer:
    """Builds jitted train/eval steps for any model in the zoo.

    Args:
      model: a flax module mapping (B, C_in, T) -> (B, S, T).
      config: TrainerConfig.
      loss_fn: (est (B,S,T), targets (B,S,T)) -> scalar (negated metric).
      prepare_batch: (key, raw_batch) -> (mixture (B,C_in,T), targets (B,S,T));
        defaults to the WSJ0/WHAM online remix of a (B,S,T) source batch.
      mesh: data-parallel mesh; defaults to all local devices.
    """

    def __init__(
        self,
        model,
        config: TrainerConfig = TrainerConfig(),
        loss_fn: Callable = _default_loss,
        prepare_batch: Optional[Callable] = None,
        mesh: Optional[Mesh] = None,
    ):
        self.model = model
        self.config = config
        self.loss_fn = loss_fn
        self.mesh = mesh if mesh is not None else make_mesh()
        if prepare_batch is None:

            def prepare_batch(key, batch):
                mixture, sources = augment_lib.online_remix_sources(key, batch)
                return mixture[:, None, :], sources

        self.prepare_batch = prepare_batch

        clip = (
            optax.clip_by_global_norm(config.clip_grad_norm)
            if config.clip_grad_norm > 0
            else optax.identity()
        )
        if config.optimizer == "radam_cosine":
            schedule = optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=config.learning_rate,
                warmup_steps=config.warmup_steps,
                decay_steps=config.total_steps,
            )
            opt = optax.radam(schedule)
        else:
            schedule = stepped_lr_schedule(
                config.learning_rate,
                config.divide_lr_by,
                config.patience_epochs,
                config.steps_per_epoch,
                epoch_end_phase=config.lr_decay_at_epoch_end,
            )
            opt = optax.adam(schedule)
        self.tx = optax.chain(clip, opt)

        self._repl = NamedSharding(self.mesh, P())
        self._batch_sh = NamedSharding(self.mesh, P(DATA_AXIS))

        donate = (0,) if donation_ok(self.mesh) else ()
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=donate,
            out_shardings=(None, None),
        )
        self._train_steps_chained = jax.jit(
            self._train_steps_chained_impl, donate_argnums=donate
        )
        self._jit_forward = jax.jit(self._forward)

    # -- state ---------------------------------------------------------------

    def _shard_params(self, params):
        """Place params per config: TP-sharded over the model axis when
        shard_params is on (matching init_state), replicated otherwise."""
        if self.config.shard_params and self.mesh.shape["model"] > 1:
            from sudo_rm_rf_tpu.parallel.mesh import tp_param_shardings

            shardings = tp_param_shardings(params, self.mesh)
            return jax.tree.map(jax.device_put, params, shardings)
        return jax.device_put(params, self._repl)

    def init_state(self, key: jax.Array, sample_mixture: jax.Array) -> TrainState:
        params = self._shard_params(self.model.init(key, sample_mixture)["params"])
        # jit so optimizer moments inherit the params' shardings
        opt_state = jax.jit(self.tx.init)(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state
        )

    def state_from_params(self, params) -> TrainState:
        params = self._shard_params(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=jax.jit(self.tx.init)(params),
        )

    # -- steps ---------------------------------------------------------------

    def _forward(self, params, mixture, dropout_rng=None):
        if dropout_rng is not None:
            est = self.model.apply(
                {"params": params},
                mixture,
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
        else:
            est = self.model.apply({"params": params}, mixture)
        if self.config.mixture_consistency is not None:
            mix = mixture if mixture.ndim == 3 else mixture[:, None, :]
            est = losses_lib.mixture_consistency(
                est, mix, self.config.mixture_consistency
            )
        return est

    def _upcast_batch(self, batch):
        """Undo the upload_dtype cast as the first op of the jitted step:
        every recipe (augment, loss) then runs on fp32 exactly as with
        fp32 uploads, modulo the transfer-boundary quantization."""
        if self.config.upload_dtype is None:
            return batch
        return jax.tree.map(
            lambda a: (
                a.astype(jnp.float32)
                if jnp.issubdtype(a.dtype, jnp.floating)
                and a.dtype != jnp.float32
                else a
            ),
            batch,
        )

    def _train_step_impl(self, state: TrainState, batch, key: jax.Array):
        if self.config.train_dropout:
            # key-splitting only when enabled, so the default path's RNG
            # stream (and the chained==sequential bit-identity test) is
            # untouched
            key, dropout_key = jax.random.split(key)
        else:
            dropout_key = None
        mixture, targets = self.prepare_batch(key, self._upcast_batch(batch))
        cdtype = (
            jnp.dtype(self.config.compute_dtype)
            if self.config.compute_dtype
            else None
        )

        def loss_of_batch(params, mix, tgt, dkey=dropout_key):
            if cdtype is not None:
                params = jax.tree.map(lambda a: a.astype(cdtype), params)
                mix = mix.astype(cdtype)
            est = self._forward(params, mix, dropout_rng=dkey).astype(jnp.float32)
            loss = self.loss_fn(est, tgt)
            if self.config.loss_clamp > 0:
                loss = jnp.clip(loss, -self.config.loss_clamp, self.config.loss_clamp)
            return loss

        def loss_of(params):
            return loss_of_batch(params, mixture, targets)

        k = self.config.grad_accum_steps
        if k > 1:
            b = mixture.shape[0]
            assert b % k == 0, (
                f"batch {b} must divide grad_accum_steps {k}"
            )

            def micro(tree):
                return jax.tree.map(
                    lambda a: a.reshape((k, b // k) + a.shape[1:]), tree
                )

            m_mix, m_tgt = micro(mixture), micro(targets)

            def accum(carry, mb):
                i, mixture_i, targets_i = mb
                dkey_i = (
                    jax.random.fold_in(dropout_key, i)
                    if dropout_key is not None
                    else None
                )
                loss_i, grads_i = jax.value_and_grad(
                    lambda p: loss_of_batch(p, mixture_i, targets_i, dkey_i)
                )(state.params)
                loss_acc, grads_acc = carry
                return (
                    loss_acc + loss_i / k,
                    jax.tree.map(lambda g, gi: g + gi / k, grads_acc, grads_i),
                ), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                accum, (jnp.zeros(()), zeros), (jnp.arange(k), m_mix, m_tgt)
            )
        else:
            loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    def _train_steps_chained_impl(self, state, batches, key):
        """K train steps in ONE compiled program: lax.scan over stacked
        batches (leading axis K). Bit-identical to K sequential
        `_train_step_impl` calls with the same starting key (the scan body
        repeats the host loop's `key, sub = split(key)` sequence) — tested.

        Why this exists: through a remote device relay (the axon tunnel),
        each dispatch-with-host-data pays a large fixed scheduling stall
        (~0.5-3 s measured, vs 48 ms of actual step compute at U16/512
        bs8). One dispatch per K steps amortizes it away; the batch chunk
        rides one bulk H2D transfer (~1 GB/s measured). On a local device
        the chain is simply neutral. Returns (state, metrics_stacked, key)
        with each metric of shape (K,).
        """

        def body(carry, batch):
            st, k = carry
            k, sub = jax.random.split(k)
            st, metrics = self._train_step_impl(st, batch, sub)
            return (st, k), metrics

        (state, key), metrics = jax.lax.scan(body, (state, key), batches)
        return state, metrics, key

    def train_steps(self, state, batches, key: jax.Array):
        """Run K chained steps; `batches` is the per-step batch tree with an
        extra leading K axis (e.g. (K, B, S, T)). Returns
        (state, metrics (K,), advanced key)."""
        return self._train_steps_chained(state, self._put_batches(batches), key)

    def _host_cast(self, x):
        """Cast a host batch leaf to upload_dtype BEFORE the device
        transfer (numpy cast — jnp.bfloat16 is a valid numpy dtype via
        ml_dtypes); integer/bool leaves pass through."""
        if self.config.upload_dtype is None:
            return x
        ud = jnp.dtype(self.config.upload_dtype)
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.floating) and x.dtype != ud:
            return x.astype(ud)
        return x

    def _put_batches(self, tree):
        """Place a (K, B, ...) stacked batch tree: batch dim (axis 1)
        sharded over `data`, chain dim replicated."""
        n_data = self.mesh.shape[DATA_AXIS]
        multiprocess = jax.process_count() > 1

        def put(x):
            x = jnp.asarray(self._host_cast(x))
            sh = NamedSharding(
                self.mesh, P(*([None, DATA_AXIS] + [None] * (x.ndim - 2)))
            )
            if multiprocess:
                return jax.make_array_from_process_local_data(sh, np.asarray(x))
            if x.shape[1] % n_data:
                raise ValueError(
                    f"batch size {x.shape[1]} must be divisible by the data-"
                    f"parallel mesh size {n_data}"
                )
            return jax.device_put(x, sh)

        return jax.tree.map(put, tree)

    def _put_batch(self, tree):
        n_data = self.mesh.shape[DATA_AXIS]
        multiprocess = jax.process_count() > 1

        def put(x):
            x = jnp.asarray(self._host_cast(x))
            if multiprocess:
                # each process feeds its LOCAL shard of the global batch;
                # assemble the global sharded array across hosts (DCN path,
                # SURVEY.md section 2.7 multi-node row)
                return jax.make_array_from_process_local_data(
                    self._batch_sh, np.asarray(x)
                )
            if x.shape[0] % n_data:
                raise ValueError(
                    f"batch size {x.shape[0]} must be divisible by the data-"
                    f"parallel mesh size {n_data}; pad the batch or build the "
                    f"trainer with a smaller mesh (make_mesh(n_data=...))"
                )
            return jax.device_put(x, self._batch_sh)

        return jax.tree.map(put, tree)

    def train_step(self, state: TrainState, batch, key: jax.Array):
        return self._train_step(state, self._put_batch(batch), key)

    def eval_step(self, params, mixture, targets, metric_fns=None):
        """Compute eval metrics; metric_fns: name -> fn(est, targets, mixture)."""
        if metric_fns is None:
            sisdri = losses_lib.PermInvariantSISDR(
                n_sources=targets.shape[1],
                zero_mean=True,
                backward_loss=False,
                improvement=True,
                return_individual_results=True,
            )
            metric_fns = {
                "SISDRi": lambda est, t, m: sisdri(
                    est, t, initial_mixtures=m if m.ndim == 3 else m[:, None, :]
                )
            }
        mixture = self._put_batch(mixture)
        targets = self._put_batch(targets)
        est = self._jit_forward(params, mixture)
        return {name: fn(est, targets, mixture) for name, fn in metric_fns.items()}
