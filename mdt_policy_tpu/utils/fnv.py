"""FNV-1 hashing with pyhash-compatible semantics.

The reference depends on `pyhash.fnv1_32()` (a ~73k-LoC vendored C++
extension) for exactly two behaviors: deterministic validation window sizes
(`mdt/datasets/base_dataset.py:20,24-37`) and deterministic evaluation initial
states (`mdt/evaluation/utils.py:17,304-306`). Both hash the str's UTF-16-LE
bytes with the BOM stripped (pyhash-0.9.3/src/Hash.h:219-268).

This module prefers the native C extension (`mdt_policy_tpu/native/
fnv_native.c`, auto-built on first use) and falls back to a bit-exact pure
Python implementation.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sysconfig
from pathlib import Path

logger = logging.getLogger(__name__)

_FNV1_32_INIT = 0x811C9DC5
_FNV_32_PRIME = 0x01000193
_FNV1_64_INIT = 0xCBF29CE484222325
_FNV_64_PRIME = 0x100000001B3


def _marshal(data) -> bytes:
    if isinstance(data, bytes):
        return data
    if isinstance(data, str):
        return data.encode("utf-16-le")
    raise TypeError("expected str or bytes")


def _fnv1_32_py(data, seed: int = _FNV1_32_INIT) -> int:
    h = seed & 0xFFFFFFFF
    for b in _marshal(data):
        h = (h * _FNV_32_PRIME) & 0xFFFFFFFF
        h ^= b
    return h


def _fnv1a_32_py(data, seed: int = _FNV1_32_INIT) -> int:
    h = seed & 0xFFFFFFFF
    for b in _marshal(data):
        h ^= b
        h = (h * _FNV_32_PRIME) & 0xFFFFFFFF
    return h


def _fnv1_64_py(data, seed: int = _FNV1_64_INIT) -> int:
    h = seed & 0xFFFFFFFFFFFFFFFF
    for b in _marshal(data):
        h = (h * _FNV_64_PRIME) & 0xFFFFFFFFFFFFFFFF
        h ^= b
    return h


def _fnv1a_64_py(data, seed: int = _FNV1_64_INIT) -> int:
    h = seed & 0xFFFFFFFFFFFFFFFF
    for b in _marshal(data):
        h ^= b
        h = (h * _FNV_64_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


def _build_native() -> bool:
    """Compile the C extension in place; returns True on success."""
    native_dir = Path(__file__).resolve().parent.parent / "native"
    src = native_dir / "fnv_native.c"
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = native_dir / f"_fnv_native{ext_suffix}"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return True
    include = sysconfig.get_paths()["include"]
    cmd = ["gcc", "-shared", "-fPIC", "-O3", str(src),
           f"-I{include}", "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("fnv native build failed (%s); using Python fallback", e)
        return False


def _load():
    if os.environ.get("MDT_TPU_NO_NATIVE"):
        return None
    # freshness check FIRST: a stale binary must never shadow fnv_native.c
    # (the extension is build-on-first-use and not under version control)
    if _build_native():
        try:
            from mdt_policy_tpu.native import _fnv_native
            return _fnv_native
        except ImportError:
            pass
    return None


_native = _load()

if _native is not None:
    fnv1_32 = _native.fnv1_32
    fnv1a_32 = _native.fnv1a_32
    fnv1_64 = _native.fnv1_64
    fnv1a_64 = _native.fnv1a_64
    murmur3_32 = _native.murmur3_32
    xx_32 = _native.xx_32
    xx_64 = _native.xx_64
    NATIVE = True
else:  # pure-Python fallback, bit-exact
    fnv1_32 = _fnv1_32_py
    fnv1a_32 = _fnv1a_32_py
    fnv1_64 = _fnv1_64_py
    fnv1a_64 = _fnv1a_64_py
    NATIVE = False
