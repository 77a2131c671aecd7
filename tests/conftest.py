"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY §4).

The container's sitecustomize pre-imports jax and registers the remote-TPU
('axon') PJRT plugin with JAX_PLATFORMS=axon, so env vars alone don't stick —
the platform must be overridden through jax.config before first backend use.
"""

import os

# must land before the first backend initialization
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (pre-imported by sitecustomize; config still mutable)

jax.config.update("jax_platforms", "cpu")
# Numerical-parity tests compare against float32 torch references; the
# production default (fast bf16-ish matmul on MXU) stays untouched outside tests.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


def stub_module(name: str):
    """A stub module SAFE to register in sys.modules: it carries a real
    ModuleSpec because later imports of libraries like transformers probe
    arbitrary packages via importlib.util.find_spec, which raises ValueError
    on any sys.modules entry whose __spec__ is None (a bare ModuleType)."""
    import importlib.machinery
    import types

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m
