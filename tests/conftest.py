"""Test config: run everything on a virtual 8-device CPU mesh.

Must set env before JAX initializes a backend (conftest imports first).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# determinism + fp32 matmuls for parity tests
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# The axon sitecustomize force-registers a TPU backend and overrides
# jax_platforms via jax.config.update — env vars alone don't win. Re-override
# here, before any backend is locked in, so tests run on the virtual CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "sudo_rm_rf"))


if has_reference() and REFERENCE_ROOT not in sys.path:
    # the reference torch package is used strictly as a golden numerical
    # oracle in parity tests; it is never imported by the framework itself.
    sys.path.insert(0, REFERENCE_ROOT)

# some reference modules import glob2, which isn't installed; stdlib glob is
# API-compatible for the patterns they use.
if "glob2" not in sys.modules:
    import glob as _glob

    sys.modules["glob2"] = _glob
