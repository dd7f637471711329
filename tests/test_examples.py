"""The committed examples must actually run: they double as user-facing
smoke tests (each prints 'done' on success). Executed in a clean
subprocess on the CPU backend with the repo's persistent compile cache,
exactly how a user on a TPU-less box would run them."""

import pytest

pytestmark = pytest.mark.slow

import os
import subprocess
import sys

from tests.conftest import REPO_ROOT


def _run_example(*argv, timeout=900):
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_",
                                "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""   # keep the axon TPU plugin out
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO_ROOT, ".jax_cache")
    return subprocess.run([sys.executable, *argv], cwd=REPO_ROOT, env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_serving_example_micro():
    proc = _run_example("examples/serving.py", "--micro")
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "/tts -> 200" in out
    assert "/stream -> 200" in out
    assert "restarted server answered" in out
    assert out.rstrip().endswith("done")


def test_basic_usage_example_micro():
    proc = _run_example("examples/basic_usage.py", "--micro")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "valid frames" in proc.stdout
    assert "served 3 requests" in proc.stdout


def test_voice_over_example_micro(tmp_path):
    out = str(tmp_path / "vo.wav")
    proc = _run_example("examples/voice_over.py", "--micro",
                        "--line", "0|привет мир", "--line", "1|тест",
                        "--out", out)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(out)
    assert "2 lines" in proc.stdout
