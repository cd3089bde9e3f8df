"""TPU-native SuDoRM-RF source-separation framework.

A brand-new JAX / XLA / Pallas / pjit implementation of the capabilities of
the reference PyTorch repo `etzinis/sudo_rm_rf` (mounted read-only at
/root/reference). Not a port: functional param pytrees, shape-static jitted
graphs, explicit RNG keys, mesh-sharded data-parallel training, and fused
Pallas kernels for the hot U-ConvBlock op.

Subpackages
-----------
ops        Low-level numerical ops (conv1d, transposed conv1d, GlobLN, padding)
           with PyTorch-compatible semantics (verified by golden tests).
models     Model zoo: SuDoRM-RF variants + baselines, as flax.linen modules.
losses     Permutation-invariant SI-SDR / SNR training losses and metrics.
data       Host-side dataset pipeline + on-device mixing augmentation.
parallel   Mesh construction and sharding rules (ICI data parallelism).
train      Generic trainer (the reference's 6 runner scripts as one loop).
inference  Overlap-add chunked long-recording separation runtime.
convert    PyTorch checkpoint (.pt) -> JAX param pytree converters.
utils      Metrics logging, audio logging, benchmarking helpers.
"""

__version__ = "0.1.0"
