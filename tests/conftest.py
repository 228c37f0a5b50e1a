"""Test harness config: run everything on a simulated 8-device CPU mesh.

This is the JAX analogue of the reference's de-facto fake backend (the
num_shards<=1 degradation of tpu_cross_replica_stack,
utils/model_utils.py:680-683): sharding/collective code paths execute for
real against 8 virtual CPU devices, no TPU required.

NOTE: this image's sitecustomize force-sets JAX_PLATFORMS=axon (the remote
TPU tunnel), overriding the env var — so we must also override via
jax.config immediately after import, before any backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests never touch the TPU tunnel; dropping the sitecustomize trigger keeps
# subprocesses spawned by tests (oracles, multiprocess smoke workers) from
# re-registering the axon backend at import — which blocks for minutes when
# the tunnel is wedged, spuriously timing out CPU-only subprocess tests.
# (Too late for THIS process — sitecustomize already ran — but conftest's
# jax.config override below handles that.)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
