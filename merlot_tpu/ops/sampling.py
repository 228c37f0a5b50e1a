"""Randomness primitives with explicit PRNG keys.

The reference relies on implicit TF op-level RNG (utils/model_utils.py:605-649,
742-755); here every draw threads a jax.random key. The *distributions*
match; seeds do not (and cannot) — parity tests therefore check
distributional properties, not bit-equality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rekey(k: jax.Array, impl: str = "rbg") -> jax.Array:
    """Re-key a threefry key so subsequent ``random.bits`` draws use
    ``impl`` (e.g. 'rbg' = the TPU-native RngBitGenerator) while
    split/fold_in stay threefry over the key data. Distribution is
    unchanged; only the stream differs. See train_step.dropout_key for
    the measured win on dropout masks (~23 ms/step at the flagship
    shape); serving samplers use it for the per-step gumbel draws."""
    if impl == "threefry":
        return k
    return jax.random.wrap_key_data(
        jax.random.bits(k, (4,), jnp.uint32), impl=impl)


def gumbel_topk_without_replacement(key: jax.Array, logits: jnp.ndarray,
                                    num_samples: int) -> jnp.ndarray:
    """Sample ``num_samples`` indices without replacement via Gumbel top-k.

    reference: utils/model_utils.py:640-649. logits [..., N] -> int32 indices
    [..., num_samples], ordered by perturbed logit (descending), i.e. the
    first index is the highest-probability draw.
    """
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(logits + g, num_samples)
    return idx.astype(jnp.int32)


def sample_bernoulli(key: jax.Array, p: float | jnp.ndarray,
                     shape: tuple = ()) -> jnp.ndarray:
    """Bernoulli(p) draw(s) as bool (reference: utils/model_utils.py:742-755)."""
    return jax.random.uniform(key, shape) < p


def sample_categorical(key: jax.Array, log_probs: jnp.ndarray,
                       shape: tuple) -> jnp.ndarray:
    """Categorical draws from 1-D log_probs to an arbitrary output shape."""
    return jax.random.categorical(key, log_probs, shape=shape).astype(jnp.int32)


def binomial_sample(key: jax.Array, n: int, p: float) -> jnp.ndarray:
    """Single Binomial(n, p) draw via an explicit categorical over counts.

    reference: utils/model_utils.py:605-625 (log-pmf built from lgamma terms).
    """
    counts = jnp.arange(0, n + 1, dtype=jnp.float32)
    n_f = jnp.float32(n)
    logits = (-jax.lax.lgamma(1.0 + n_f - counts)
              - jax.lax.lgamma(1.0 + counts)
              + counts * jnp.log(p)
              + (n_f - counts) * jnp.log1p(-p))
    return jax.random.categorical(key, logits).astype(jnp.int32)
