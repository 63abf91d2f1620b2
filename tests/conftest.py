# conftest.py — hermetic CPU test environment with a virtual 8-device mesh.
import os

# Must be set before jax import: tests run on a virtual 8-device CPU mesh so
# multi-chip sharding paths execute without TPU hardware.  Set RIG_TEST_TPU=1
# to keep the real TPU backend instead (runs the @skipif-TPU kernel tests).
USE_TPU = os.environ.get("RIG_TEST_TPU") == "1"
if not USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the
# config API still wins if applied before backend initialization.
import jax  # noqa: E402

if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_SRC = Path("/root/reference/src")
REFERENCE_MG = Path("/root/reference/multigraph_generation")


def has_reference() -> bool:
    return REFERENCE_SRC.exists()
