"""Normalization ops with the reference's exact numerics.

These are pure functions taking explicit scale/offset parameters; the flax
modules in merlot_tpu.nn wrap them. All three follow the reference's
mixed-precision contract: **compute statistics in fp32, store/return in the
input dtype** (bf16 activations, fp32 master params).

  * layer_norm   — reference: utils/model_utils.py:113-130 (eps 1e-5, the
                   ``x*scale - mean*scale + beta`` formulation)
  * group_norm   — reference: utils/model_utils.py:133-222 (one-pass
                   sufficient-statistics variance, eps 1e-4 in the ResNet)
  * standardize_kernel — weight standardization for convs,
                   reference: utils/vision_transformer.py:56-63
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               epsilon: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; fp32 statistics, output in x.dtype.

    Uses the two-term form ``x*s - mean*s + beta`` with ``s = rsqrt(var+eps)*gamma``
    so the bf16 rounding pattern matches the reference, and the biased
    (moment) variance.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    scale = lax.rsqrt(var + epsilon) * gamma.astype(jnp.float32)
    out = xf * scale - mean * scale + beta.astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               num_groups: int = 32, epsilon: float = 1e-4,
               mean_close_to_zero: bool = True) -> jnp.ndarray:
    """GroupNorm over channels-last NHWC input; fp32 statistics.

    ``mean_close_to_zero=True`` uses the one-pass sufficient-statistics
    variance ``E[x^2] - E[x]^2`` (the reference's default, which is more
    accurate than the shifted two-pass form when the mean is ~0 pre-ReLU).
    """
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"{c} channels not divisible into {num_groups} groups")
    cpg = c // num_groups

    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, cpg)
    # statistics over everything but (batch, group)
    if mean_close_to_zero:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        mean_sq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
        var = mean_sq - jnp.square(mean)
    else:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)

    xn = (xf - mean) * lax.rsqrt(var + epsilon)
    xn = xn.reshape(x.shape)
    out = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(orig_dtype)


def standardize_kernel(kernel: jnp.ndarray, epsilon: float = 1e-5) -> jnp.ndarray:
    """Weight standardization for a conv kernel [kh, kw, cin, cout].

    Normalizes each output filter to zero mean / unit variance over its
    receptive field, in fp32 (the caller casts to bf16 afterwards if the conv
    runs in bf16).
    """
    kf = kernel.astype(jnp.float32)
    mean = jnp.mean(kf, axis=(0, 1, 2), keepdims=True)
    var = jnp.mean(jnp.square(kf - mean), axis=(0, 1, 2), keepdims=True)
    return (kf - mean) * lax.rsqrt(var + epsilon)
