"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run
against XLA's host-platform device emulation. This must happen before
jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize registers the axon TPU backend and force
# -sets jax_platforms; override it back before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_vectors(n: int, dim: int, seed: int = 0, kind: str = "random"):
    """Dataset generators mirroring the reference benchmark shapes
    (hybrid/benchmark_test.go:40-112): random / clustered / skewed."""
    r = np.random.default_rng(seed)
    if kind == "random":
        return r.standard_normal((n, dim)).astype(np.float32)
    if kind == "clustered":
        n_clusters = max(1, n // 100)
        centers = r.standard_normal((n_clusters, dim)).astype(np.float32) * 5
        asg = r.integers(0, n_clusters, n)
        return (centers[asg] +
                0.3 * r.standard_normal((n, dim)).astype(np.float32))
    if kind == "skewed":
        v = r.standard_normal((n, dim)).astype(np.float32)
        v[:, : dim // 4] *= 10.0
        return v
    raise ValueError(kind)
