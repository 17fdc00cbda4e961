"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, so this sits at module import
time of conftest (pytest imports conftest before test modules).
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# The image pre-imports jax (PYTHONPATH=/root/.axon_site), freezing config
# from the original env — override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent XLA compile cache: the suite is compile-bound on this 1-core
# host (~9 min cold); cached reruns skip every unchanged compile
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


REPO_ROOT = Path(__file__).resolve().parents[1]
