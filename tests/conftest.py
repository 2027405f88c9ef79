"""Test fixture: emulate an 8-chip TPU mesh on CPU in one process.

The reference tests the whole system against CPU-mode vLLM on a laptop
(reference: benchmark-vllm/vllm_templates.py:60-62, configs/vllm_config_macos.yaml);
our analog is JAX's host-platform device multiplexing, which exercises the
real GSPMD sharding paths without TPU hardware.

NOTE: this environment pre-imports jax in sitecustomize with a TPU backend
selected, so plain env vars in conftest are too late; we must flip the
platform through jax.config before any backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
