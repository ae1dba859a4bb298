"""Test configuration: run the suite on a virtual 8-device CPU mesh.

NOTE: this image's sitecustomize imports jax and registers the 'axon' TPU
backend at interpreter start, so JAX_PLATFORMS env tweaks are too late —
we must override via jax.config before any backend is initialized.

Real-TPU kernel tests live behind the `tpu` marker and are skipped here;
run them on hardware with MISTRALRS_TPU_TESTS=1 pytest -m tpu (keeps the
device backend instead of forcing CPU).
"""

import os

import jax
import pytest

_ON_HW = os.environ.get("MISTRALRS_TPU_TESTS") == "1"
if not _ON_HW:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    # Numerics tests compare against f32 torch/numpy references. Only off
    # hardware: on TPU this global poisons every Pallas kernel's jnp.dot
    # (bf16 operands + fp32 contract precision -> Mosaic "Bad lhs type").
    jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")


def pytest_collection_modifyitems(config, items):
    if _ON_HW:
        # hardware run: only the tpu-marked tests make sense (the rest
        # assume the 8-device CPU mesh)
        skip = pytest.mark.skip(reason="CPU-mesh test (hardware run)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
        return
    skip = pytest.mark.skip(reason="requires real TPU")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
