"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host-platform fake devices
(XLA_FLAGS=--xla_force_host_platform_device_count), the JAX-native way to
test DP/TP collectives without a TPU pod. Must run before jax imports.
"""

import os
import sys

# Force CPU unconditionally: the host env presets JAX_PLATFORMS=axon (TPU),
# and TPU bf16 matmuls would break f32 parity tolerances. The env var is
# captured when jax is first imported (which sitecustomize does at
# interpreter startup, BEFORE this file runs), so the env write alone is
# ignored — the explicit config update below is what actually takes effect
# (backends initialize lazily, so it still applies).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax as _jax

_jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Persistent compilation cache: repeated suite runs skip recompiles (the
# single-core box spends most of the suite in XLA CPU compilation).
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_ROOT = os.environ.get("TTS_REFERENCE_ROOT", "/root/reference")
FIXTURES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "fixtures")
ORACLE_CACHE_DIR = os.path.join(FIXTURES_DIR, "oracle_cache")


def reference_available():
    return os.path.isdir(REFERENCE_ROOT)


def oracle_available():
    """Oracle-backed parity tests run either live against the mounted
    reference tree (recording replay fixtures as a side effect) or from the
    committed fixtures in tests/fixtures/oracle_cache (bare clone)."""
    return reference_available() or os.path.isdir(ORACLE_CACHE_DIR)


def pretrained_dir():
    """Reference pretrained/ dir when mounted, else the committed snapshot
    of the tiny metadata files parity tests need (stats.json)."""
    import shutil

    fix = os.path.join(FIXTURES_DIR, "reference_pretrained")
    if reference_available():
        ref = os.path.join(REFERENCE_ROOT, "pretrained")
        os.makedirs(fix, exist_ok=True)
        dst = os.path.join(fix, "stats.json")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(ref, "stats.json"), dst)
        return ref
    return fix
