"""Helper to invoke the torch oracle subprocess (see torch_oracle.py)."""

import os
import subprocess
import sys
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ORACLE = os.path.join(_HERE, "torch_oracle.py")


def run_oracle(job, inputs, timeout=600):
    """Run a torch oracle job in a clean subprocess; returns dict of arrays."""
    # Children must NOT register the axon TPU plugin (sitecustomize gates on
    # PALLAS_AXON_POOL_IPS): the parent already holds the single TPU grant
    # and a second claimant deadlocks at interpreter startup. Also keep the
    # child off jax entirely — torch and jax can't share a process here.
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON", "AXON_", "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    with tempfile.TemporaryDirectory() as td:
        in_path = os.path.join(td, "in.npz")
        out_path = os.path.join(td, "out.npz")
        np.savez(in_path, **inputs)
        proc = subprocess.run(
            [sys.executable, _ORACLE, job, in_path, out_path],
            env=env, capture_output=True, text=True, timeout=timeout)
        if proc.returncode != 0:
            raise RuntimeError(
                f"oracle job {job} failed:\n{proc.stdout}\n{proc.stderr}")
        with np.load(out_path) as z:
            return {k: z[k].copy() for k in z.files}
