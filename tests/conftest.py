"""Test configuration: run the suite on a virtual 8-device CPU mesh.

NOTE: this image's sitecustomize imports jax and registers the 'axon' TPU
backend at interpreter start, so JAX_PLATFORMS env tweaks are too late —
we must override via jax.config before any backend is initialized.

Real-TPU kernel tests live behind the `tpu` marker and are skipped here;
the driver's bench run exercises the TPU path.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Numerics tests compare against f32 torch/numpy references.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires real TPU")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
