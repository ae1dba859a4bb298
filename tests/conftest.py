"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU kernel tests live behind the `tpu` marker and are skipped here;
the driver's bench run exercises the TPU path.
"""

import os

# Must be set before jax import (tests never see the real TPU backend).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# Numerics tests compare against f32 torch/numpy references.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")


def pytest_collection_modifyitems(config, items):
    import jax

    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires real TPU")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
