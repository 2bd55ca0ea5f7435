"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference's tests are CPU-feature-aware so SIMD variants are skipped on
machines lacking them (tests/TestSuite.hs:52-53).  Our analog: tests run on
the CPU backend with 8 virtual devices so the *sharded* code paths (the
part that needs a pod) execute everywhere; TPU-only paths (Pallas compiled
mode) are exercised in interpret mode here and for real by bench.py.
"""

import os

# jax may already be imported at interpreter boot (the machine's PJRT
# sitecustomize); backends are lazy, so overriding the config here still
# wins as long as no test ran yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Input distributions mirroring the reference's QuickCheck generators
# (tests/TestSuite.hs:55-58): block sizes, tap counts, values in (-10, 10),
# factors from a small prime set.  Sizes are scaled down vs the reference's
# {1024..65536} to keep the matrix fast; the full sizes run in bench.py.
SIZES = [1024, 4096]
NUM_COEFFS = [32, 64, 128, 256]
FACTORS = [1, 2, 3, 5, 7, 11, 13, 17, 23]
