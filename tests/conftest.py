"""Test bootstrap: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware isn't available in CI; sharding correctness is
exercised via XLA's host-platform device-count override (SURVEY.md section 4
test-strategy item 4). Must run before the first ``import jax``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The TPU plugin's sitecustomize imports jax at interpreter startup, so env
# mutations above don't reach an already-imported jax — force the backend via
# config (effective until the first backend initialization).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

# Persistent compilation cache: XLA-CPU compiles of the conv models dominate
# test wall time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _restore_conv_padding_mode():
    """The engine flips the global conv padding mode when it loads an ONNX
    checkpoint (models/nn.py contract); without restoration one such test
    would silently shift every later test's conv grids."""
    from frp_tpu.models import nn

    mode = nn._PADDING_MODE
    yield
    nn._PADDING_MODE = mode
