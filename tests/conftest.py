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


@pytest.fixture(autouse=True)
def _reset_process_globals():
    """Engines built with TP/PP/EP set process-global state — the active
    mesh (parallel/mesh.py) that self-wraps the attention kernel in
    shard_map, and Mixtral's MoE impl + mesh (set_moe_impl). A test that
    doesn't clear them leaks into the next test (e.g. single-device
    Mixtral failing shard_map divisibility against a stale (1,2,2,2)
    mesh from an earlier EP engine test)."""
    yield
    from vllm_backend_public_tpu.models import mixtral
    from vllm_backend_public_tpu.parallel.mesh import set_active_mesh
    set_active_mesh(None)
    mixtral.set_moe_impl(mixtral.MOE_IMPL_DEFAULT)
