"""merlot_tpu — a TPU-native JAX framework with the capabilities of MERLOT.

A from-scratch rebuild of the rowanz/merlot video+language pretraining stack
(reference: TF 1.15 + TPUEstimator) designed TPU-first:

  * jax/XLA for the compute path (bf16 matmuls on the MXU, fp32 master params)
  * jax.sharding.Mesh + jit/shard_map for data/tensor parallelism over ICI
  * Pallas kernels for fused attention on the hot path
  * an async host data pipeline replacing tf.data

Layering (bottom up): core → ops → nn → models → train / data / downstream.
"""

__version__ = "0.1.0"

from merlot_tpu.core.config import NeatConfig  # noqa: F401
