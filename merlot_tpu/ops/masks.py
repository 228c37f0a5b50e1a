"""Attention-mask and gather utilities (API parity with the reference's
general-purpose helpers; MERLOT proper only uses bidirectional validity
masks, but the library surface includes these).

  * one_hot_gather      — utils/model_utils.py:225-235 (deterministic
                          matmul-based gather; modern XLA lowers jnp.take
                          efficiently, this exists for bit-determinism needs)
  * ltr_attention_mask  — utils/model_utils.py:352-360
  * unilm_attention_mask— utils/model_utils.py:363-385 (hybrid causal +
                          bidirectional-token mask)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def one_hot_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of [N, H] via one-hot matmul (MXU-friendly, deterministic)."""
    n = table.shape[0]
    dtype = jnp.bfloat16 if table.dtype == jnp.bfloat16 else jnp.float32
    oh = (idx[:, None] == jnp.arange(n)[None]).astype(dtype)
    return jnp.dot(oh, table.astype(dtype), preferred_element_type=dtype)


def ltr_attention_mask(nd: int, ns: int, dtype=jnp.float32) -> jnp.ndarray:
    """Causal [nd, ns] mask whose lower-right triangle is 1 (supports a
    cached prefix: ns >= nd)."""
    i = jnp.arange(nd)[:, None]
    j = jnp.arange(ns)[None]
    return (i >= j - ns + nd).astype(dtype)


def unilm_attention_mask(is_bidirectional: jnp.ndarray,
                         is_padding: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """Hybrid mask: position i attends j if i >= j (causal) OR token j is
    flagged bidirectional; padding keys are excluded. [B, L] -> [B, L, L]."""
    b, l = is_bidirectional.shape
    causal = jnp.arange(l)[:, None] >= jnp.arange(l)[None]
    joint = is_bidirectional[:, None, :].astype(bool) | causal[None]
    if is_padding is not None:
        joint = joint & ~is_padding[:, None].astype(bool)
    return joint.astype(jnp.float32)
