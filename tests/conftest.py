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

# Per-SESSION persistent compile cache: many slow-tier tests compile the
# IDENTICAL tiny-agent programs (same TINY_OVERRIDES shapes across train()
# invocations); jax's jit cache keys on callable identity, so each test pays
# the XLA compile again. A session-private cache dir dedupes them. Safe
# here where the driver dryrun disables it: the blobs are written and read
# by THIS process tree on THIS machine within one session (the loader's
# machine-feature warning is a false positive on its own tuning
# pseudo-features — tests/test_* and the AOT bench probe execute such
# blobs correctly). The dir dies with the session: nothing foreign can
# ever be loaded, and no stale blob survives a jaxlib upgrade.
import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

_cache_dir = tempfile.mkdtemp(prefix="mdt_test_jaxcache_")
atexit.register(shutil.rmtree, _cache_dir, ignore_errors=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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
