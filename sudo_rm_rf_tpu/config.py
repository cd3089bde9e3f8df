"""Configuration: dataset roots + experiment hyperparameter dataclasses.

Replaces the reference's three-tier config sprawl (`__config__.py` module
constants, two argparse CLIs, and `hparams_parser.get_hparams_from_args` —
SURVEY.md section 5 "Config / flag system") with one dataclass tree. Dataset
roots resolve from environment variables so nothing is hardcoded:

    SUDO_TPU_WHAM_ROOT, SUDO_TPU_WHAMR_ROOT, SUDO_TPU_FUSS_ROOT,
    SUDO_TPU_LIBRI2MIX_ROOT, SUDO_TPU_MUSDB_ROOT, SUDO_TPU_MUSDB8K_ROOT
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


class DataPaths:
    """Dataset roots, resolved from env vars at ACCESS time (so tests and
    CLI flags can set them after import)."""

    @property
    def wham_root(self):
        return _env("SUDO_TPU_WHAM_ROOT", "/mnt/data/wham")

    @property
    def whamr_root(self):
        return _env("SUDO_TPU_WHAMR_ROOT", "/mnt/data/whamr")

    @property
    def fuss_root(self):
        return _env("SUDO_TPU_FUSS_ROOT", "/mnt/data/fuss")

    @property
    def libri2mix_root(self):
        return _env("SUDO_TPU_LIBRI2MIX_ROOT", "/mnt/data/libri_mix/Libri2Mix")

    @property
    def musdb_root(self):
        return _env("SUDO_TPU_MUSDB_ROOT", "/mnt/data/musdb")

    @property
    def musdb8k_root(self):
        return _env("SUDO_TPU_MUSDB8K_ROOT", "/mnt/data/musdb8k")

    @property
    def checkpoints(self):
        return _env("SUDO_TPU_CKPT_DIR", os.path.expanduser("~/sudo_tpu_checkpoints"))

    @property
    def metrics(self):
        return _env("SUDO_TPU_METRICS_DIR", os.path.expanduser("~/sudo_tpu_metrics"))


paths = DataPaths()


@dataclass
class ModelConfig:
    """Hyperparameters shared by the SuDoRM-RF family (reference CLI flags
    `improved_cmd_args_parser_v2.py:60-120`)."""

    model_type: str = "relu"
    out_channels: int = 128
    in_channels: int = 512
    num_blocks: int = 16
    upsampling_depth: int = 5
    enc_kernel_size: int = 21
    enc_num_basis: int = 512
    num_sources: int = 2
    group_size: int = 16  # groupcomm only
    in_audio_channels: int = 1
    # attentive only
    n_heads: int = 4
    att_dims: int = 256
    att_dropout: float = 0.1
    # improved-model block implementation: 'xla' or 'fma' (same params;
    # the FMA formulation is ~1.7x faster on TPU, fwd and bwd)
    block_impl: str = "fma"
    remat_blocks: bool = False
    # attentive models: run the block stack as one lax.scan over stacked
    # params (same math; much smaller compiled program)
    scan_blocks: bool = False


    def build(self, tp_mesh=None):
        from sudo_rm_rf_tpu import models

        kwargs = dict(
            out_channels=self.out_channels,
            in_channels=self.in_channels,
            num_blocks=self.num_blocks,
            upsampling_depth=self.upsampling_depth,
            enc_kernel_size=self.enc_kernel_size,
            enc_num_basis=self.enc_num_basis,
            num_sources=self.num_sources,
        )
        if self.model_type in ("relu", "improved"):
            kwargs.update(block_impl=self.block_impl,
                          remat_blocks=self.remat_blocks)
            if tp_mesh is not None:
                kwargs.update(tp_mesh=tp_mesh)
        if self.model_type == "groupcomm_v2":
            # 'fma' maps to the group-merged FMA blocks (same params); any
            # other value falls back to the behavioral-reference blocks
            kwargs.update(group_size=self.group_size,
                          in_audio_channels=self.in_audio_channels,
                          block_impl=self.block_impl,
                          remat_blocks=self.remat_blocks)
        elif self.model_type == "causal":
            kwargs.update(in_audio_channels=self.in_audio_channels)
        elif self.model_type.startswith("attention"):
            kwargs.update(n_heads=self.n_heads, att_dims=self.att_dims,
                          att_dropout=self.att_dropout,
                          scan_blocks=self.scan_blocks)
        return models.get_model(self.model_type, **kwargs)


@dataclass
class DataConfig:
    train: Tuple[str, ...] = ("WHAM",)
    val: Tuple[str, ...] = ("WHAM",)
    test: Tuple[str, ...] = ()
    train_val: Tuple[str, ...] = ()
    separation_task: str = "sep_clean"
    fs: int = 8000
    audio_timelength: float = 4.0
    min_or_max: str = "min"
    zero_pad_audio: bool = True
    normalize_audio: bool = False
    n_channels: int = 1
    min_num_sources: int = 1
    max_num_sources: int = 4
    n_train: int = 0
    n_val: int = 0
    n_test: int = 0
    n_train_val: int = 0
    batch_size: int = 4
    n_jobs: int = 4
    # legacy AUGMENTED_* hierarchical online-mixing datasets
    # (`dataset_specific_params.py:18-77`): per-split hierarchical roots
    train_dataset_paths: Tuple[str, ...] = ()
    val_dataset_paths: Tuple[str, ...] = ()
    test_dataset_paths: Tuple[str, ...] = ()
    max_abs_snr: float = 2.5


@dataclass
class TrainConfig:
    n_epochs: int = 200
    learning_rate: float = 1e-3
    divide_lr_by: float = 3.0
    patience_epochs: int = 0
    clip_grad_norm: float = 5.0
    loss_clamp: float = 30.0
    mixture_consistency: Optional[str] = None
    optimizer: str = "adam"  # 'adam' | 'radam_cosine'
    grad_accum_steps: int = 1
    # train steps per device dispatch (lax.scan chain, bit-identical to
    # sequential steps): amortizes the per-dispatch stall of remote-relay
    # devices (~0.5-3 s measured vs ~50 ms of step compute). 1 = unchained.
    chain_steps: int = 1
    # mixed precision: fwd/bwd compute dtype (fp32 master params + loss);
    # e.g. 'bfloat16' -- the fastest measured training mode (BENCHMARKS.md)
    compute_dtype: Optional[str] = None
    # host->device batch transfer dtype ('bfloat16' halves H2D bytes; the
    # step upcasts to fp32 on-device, so only the transfer is quantized)
    upload_dtype: Optional[str] = None
    # max train dispatches in flight before the host blocks on the oldest
    # (bounds relay queue depth + host batch-buffer RSS); 0 = unbounded
    max_inflight: int = 2
    # device-resident training data: decode the train pool once into HBM and
    # draw every batch on-device inside a scanned epoch (zero per-step H2D;
    # see train/resident.py). Supported for AUGMENTED_*, FUSS, WHAMR and any
    # fixed-shape loader.
    device_data: bool = False
    # stop after this many epochs without a new best on the primary val
    # metric (0 = train all n_epochs; the reference trains a fixed epoch
    # count and relies on save_if_best — this adds the plateau policy)
    early_stop_patience: int = 0
    # mesh model-axis size (1 = pure DP). >1 shards large params over the
    # model axis (storage TP) and, for block_impl='fma' improved models,
    # enables compute TP via activation sharding constraints.
    n_model: int = 1
    save_checkpoint_every: int = 10
    checkpoints_path: str = field(default_factory=lambda: paths.checkpoints)
    seed: int = 0


@dataclass
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    experiment_name: str = "sudo_tpu_experiment"
    tags: Tuple[str, ...] = ()

    def hparams(self) -> dict:
        """Flatten into the reference-style hparams dict
        (`hparams_parser.py:10-56`)."""
        out = {}
        for section in (self.model, self.data, self.train):
            out.update(dataclasses.asdict(section))
        out["train"] = list(self.data.train)
        out["val"] = list(self.data.val)
        out["test"] = list(self.data.test)
        out["train_val"] = list(self.data.train_val)
        return out
