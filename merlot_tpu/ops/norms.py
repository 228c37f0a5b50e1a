"""Normalization ops with the reference's exact numerics.

These are pure functions taking explicit scale/offset parameters; the flax
modules in merlot_tpu.nn wrap them. All three follow the reference's
mixed-precision contract: **compute statistics in fp32, store/return in the
input dtype** (bf16 activations, fp32 master params).

  * layer_norm   — reference: utils/model_utils.py:113-130 (eps 1e-5, the
                   ``x*scale - mean*scale + beta`` formulation)
  * group_norm   — reference: utils/model_utils.py:133-222 (one-pass
                   sufficient-statistics variance, eps 1e-4 in the ResNet;
                   the reference also casts bf16 up to fp32 for the stats)
  * standardize_kernel — weight standardization for convs,
                   reference: utils/vision_transformer.py:56-63

TPU memory-traffic note: both norms carry a custom_vjp. XLA's default
backward for an fp32-stats norm over bf16 activations saves FP32 copies of
the normalized tensor (2x the activation bytes, e.g. 41 MB per ResNet
block at pretrain shapes — measured as the dominant cost of the ResNet
backward). The custom backward saves only (x bf16, mean, rstd) and
recomputes x_hat on the fly; same math, same fp32 statistics, half the HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


# ----------------------------------------------------------------------
# layer norm
# ----------------------------------------------------------------------
def _ln_fwd_math(x, gamma, beta, epsilon):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = lax.rsqrt(var + epsilon)
    scale = rstd * gamma.astype(jnp.float32)
    out = xf * scale - mean * scale + beta.astype(jnp.float32)
    return out.astype(x.dtype), mean, rstd


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               epsilon: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis; fp32 statistics, output in x.dtype.

    Uses the two-term form ``x*s - mean*s + beta`` with
    ``s = rsqrt(var+eps)*gamma`` so the bf16 rounding pattern matches the
    reference, and the biased (moment) variance.
    """
    return _ln_fwd_math(x, gamma, beta, epsilon)[0]


def _ln_fwd(x, gamma, beta, epsilon):
    out, mean, rstd = _ln_fwd_math(x, gamma, beta, epsilon)
    return out, (x, gamma, mean, rstd)


# Backward formulation knob (same idea as GN_BWD below): 'stats' never
# forms x_hat as a tensor — per-row moments of (dx_hat, dx_hat*x) replace
# it, so the backward is reductions + one elementwise pass in (x, dy)
# with per-row scalars. 'xhat' is the literal form (A/B + test oracle).
LN_BWD = "stats"


def _ln_bwd_xhat(epsilon, res, dy):
    x, gamma, mean, rstd = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    x_hat = (xf - mean) * rstd
    reduce_axes = tuple(range(x.ndim - 1))
    dgamma = jnp.sum(dyf * x_hat, axis=reduce_axes)
    dbeta = jnp.sum(dyf, axis=reduce_axes)
    dx_hat = dyf * gamma.astype(jnp.float32)
    m1 = jnp.mean(dx_hat, axis=-1, keepdims=True)
    m2 = jnp.mean(dx_hat * x_hat, axis=-1, keepdims=True)
    dx = (rstd * (dx_hat - m1 - x_hat * m2)).astype(x.dtype)
    return dx, dgamma, dbeta


def _ln_bwd_stats(epsilon, res, dy):
    x, gamma, mean, rstd = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    gf = gamma.astype(jnp.float32)
    reduce_axes = tuple(range(x.ndim - 1))
    n = float(x.shape[-1])

    dx_hat = dyf * gf
    m1 = jnp.sum(dx_hat, axis=-1, keepdims=True) / n
    mxy = jnp.sum(dx_hat * xf, axis=-1, keepdims=True) / n
    m2 = (mxy - mean * m1) * rstd

    # dgamma = sum_rows dy*x_hat, expanded so no x_hat tensor is formed
    dgamma = jnp.sum(dyf * (xf - mean) * rstd, axis=reduce_axes)
    dbeta = jnp.sum(dyf, axis=reduce_axes)

    coef = rstd * rstd * m2
    dx = (rstd * (dx_hat - m1) - (xf - mean) * coef).astype(x.dtype)
    return dx, dgamma, dbeta


def _ln_bwd(epsilon, res, dy):
    fn = _ln_bwd_stats if LN_BWD == "stats" else _ln_bwd_xhat
    return fn(epsilon, res, dy)


layer_norm.defvjp(_ln_fwd, _ln_bwd)


# ----------------------------------------------------------------------
# group norm
# ----------------------------------------------------------------------
def _gn_stats(xf, mean_close_to_zero):
    # statistics over everything but (batch, group); xf [B, S, G, Cpg]
    if mean_close_to_zero:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        mean_sq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
        var = mean_sq - jnp.square(mean)
    else:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    return mean, var


def _gn_reshape(x, num_groups):
    b = x.shape[0]
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"{c} channels not divisible into {num_groups} groups")
    return x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)


def _gn_fwd_math(x, gamma, beta, num_groups, epsilon, mean_close_to_zero):
    xf = _gn_reshape(x, num_groups)
    mean, var = _gn_stats(xf, mean_close_to_zero)
    rstd = lax.rsqrt(var + epsilon)
    xn = ((xf - mean) * rstd).reshape(x.shape)
    out = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(x.dtype), mean, rstd


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               num_groups: int = 32, epsilon: float = 1e-4,
               mean_close_to_zero: bool = True) -> jnp.ndarray:
    """GroupNorm over channels-last NHWC input; fp32 statistics.

    ``mean_close_to_zero=True`` uses the one-pass sufficient-statistics
    variance ``E[x^2] - E[x]^2`` (the reference's default, which is more
    accurate than the shifted two-pass form when the mean is ~0 pre-ReLU).
    """
    return _gn_fwd_math(x, gamma, beta, num_groups, epsilon,
                        mean_close_to_zero)[0]


def _gn_fwd(x, gamma, beta, num_groups, epsilon, mean_close_to_zero):
    out, mean, rstd = _gn_fwd_math(x, gamma, beta, num_groups, epsilon,
                                   mean_close_to_zero)
    return out, (x, gamma, mean, rstd)


# Backward formulation knob:
#   'stats' (default) — sufficient-statistics form: two reductions of
#       (dy, dy*x) over the spatial axis + one elementwise pass writing dx
#       straight from (x, dy) with per-(batch, group) scalars. x_hat is
#       never formed as a tensor, so XLA has no [B,H,W,C] fp32 intermediate
#       to materialize (the literal form measured a 620 MB fp32 x_hat
#       round-trip per stem site — ~5 ms/step at pretrain shapes).
#   'xhat' — the literal textbook form (kept for A/B and as the oracle in
#       tests; same math, different floating-point association).
GN_BWD = "stats"


def _gn_bwd_xhat(num_groups, epsilon, mean_close_to_zero, res, dy):
    x, gamma, mean, rstd = res
    xf = _gn_reshape(x, num_groups)                    # [B, S, G, Cpg]
    x_hat = (xf - mean) * rstd
    dyf = _gn_reshape(dy, num_groups)
    c = x.shape[-1]
    # per-channel param grads: reduce over batch + spatial
    dgamma = jnp.sum(dyf * x_hat, axis=(0, 1)).reshape(c)
    dbeta = jnp.sum(dyf, axis=(0, 1)).reshape(c)
    gamma_g = gamma.astype(jnp.float32).reshape(1, 1, num_groups, -1)
    dx_hat = dyf * gamma_g
    m1 = jnp.mean(dx_hat, axis=(1, 3), keepdims=True)
    m2 = jnp.mean(dx_hat * x_hat, axis=(1, 3), keepdims=True)
    dx = (rstd * (dx_hat - m1 - x_hat * m2)).reshape(x.shape).astype(x.dtype)
    return dx, dgamma, dbeta


def _gn_bwd_stats(num_groups, epsilon, mean_close_to_zero, res, dy):
    x, gamma, mean, rstd = res
    xf = _gn_reshape(x, num_groups)                    # [B, S, G, Cpg]
    dyf = _gn_reshape(dy, num_groups)
    c = x.shape[-1]
    s_len, cpg = xf.shape[1], xf.shape[3]
    denom = float(s_len * cpg)
    gamma_g = gamma.astype(jnp.float32).reshape(1, 1, num_groups, -1)

    # pass 1: per-(b, g, c') sufficient statistics of (dy, dy*x)
    a = jnp.sum(dyf * xf, axis=1, keepdims=True)       # [B, 1, G, Cpg]
    bv = jnp.sum(dyf, axis=1, keepdims=True)           # [B, 1, G, Cpg]

    # everything the textbook form derives from x_hat, in closed form:
    #   m1  = mean(dx_hat)        = sum_c'(gamma * bv) / (S*Cpg)
    #   m2  = mean(dx_hat * x_hat) = (mean(dx_hat*x) - mean*m1) * rstd
    m1 = jnp.sum(gamma_g * bv, axis=3, keepdims=True) / denom
    mxy = jnp.sum(gamma_g * a, axis=3, keepdims=True) / denom
    m2 = (mxy - mean * m1) * rstd

    # param grads: dgamma = sum_{b,s} dy*x_hat = sum_b rstd*(a - mean*bv)
    dgamma = jnp.sum(rstd * (a - mean * bv), axis=(0, 1)).reshape(c)
    dbeta = jnp.sum(bv, axis=(0, 1)).reshape(c)

    # pass 2: dx = rstd*(dx_hat - m1) - (x - mean)*rstd^2*m2, elementwise
    # in (x, dy) with per-(b, g) broadcast scalars — no x_hat tensor
    coef = rstd * rstd * m2
    dx = (rstd * (dyf * gamma_g - m1) - (xf - mean) * coef)
    dx = dx.reshape(x.shape).astype(x.dtype)
    return dx, dgamma, dbeta


def _gn_bwd(num_groups, epsilon, mean_close_to_zero, res, dy):
    fn = _gn_bwd_stats if GN_BWD == "stats" else _gn_bwd_xhat
    return fn(num_groups, epsilon, mean_close_to_zero, res, dy)


group_norm.defvjp(_gn_fwd, _gn_bwd)


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
