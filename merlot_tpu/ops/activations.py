"""Activation functions.

MERLOT uses the exact-erf GELU everywhere (reference: utils/model_utils.py:96-110),
NOT the tanh approximation — the distinction matters for checkpoint parity.
"""

import math

import jax.numpy as jnp
from jax import lax


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) Gaussian Error Linear Unit.

    Computed in the input dtype; under bf16 XLA evaluates erf on the VPU with
    an fp32-internal polynomial, matching the reference's bf16 behaviour.
    """
    cdf = 0.5 * (1.0 + lax.erf(x / jnp.asarray(math.sqrt(2.0), dtype=x.dtype)))
    return x * cdf
