"""Fused GroupNorm(+residual+ReLU) as a one-pass Pallas TPU kernel.

Why: in the ResNet stem (reference: utils/vision_transformer.py:118-170)
every conv is followed by GroupNorm(32) and usually a ReLU — and the
bottleneck's last GN feeds a residual add + ReLU. XLA computes the fp32
group statistics with one read of the conv output, then REREADS it for the
normalize/activation consumer: 2 reads + 1 write of every activation
tensor, plus separate fusions for the add/relu. This kernel does the whole
chain in one VMEM residency per image: read x once, fp32 one-pass
statistics (E[x^2]-E[x]^2, exactly ops/norms.py's mean_close_to_zero
math), normalize, optional residual add and ReLU, write once — and emits
(mean, rstd) so the backward is the SAME saved-stats XLA math as
ops/norms.group_norm (no pallas in the grad program; this environment's
compile helper crashes on backward kernels, PERF.md round 2).

Numerics contract (same formulas and association as norms._gn_fwd_math):
stats in fp32 over (spatial, channels-per-group), rstd = rsqrt(var + eps),
out = (x - mean) * rstd * gamma + beta cast to x.dtype, then residual-add
and ReLU in x.dtype — the unfused ``relu(group_norm(x) + residual)``
composition BottleneckBlock writes. Only the fp32 sum order differs
(channel sums then a group fold vs one fused reduce), so parity tests use
a tight allclose, not array_equal.

Supported shapes: one image's [H*W, C] slab (plus temps) must fit the
VMEM budget — true for every GN site in MERLOT's LiteResNet except
group1's 256-channel outputs at 192x352 inputs (callers fall back to the
unfused path there; see ``kernel_supported``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

from merlot_tpu.ops import norms

_VMEM_BUDGET = 11 << 20

# Trace-time backend defaults for nn.layers.GroupNorm:
#   'auto'   — the fused kernel on TPU when the shape fits the budget
#   'xla'    — always the unfused norms.group_norm composition
#   'pallas' — force the kernel (interpret-mode tests)
# BACKEND drives forward-only (deterministic) paths; TRAIN_BACKEND drives
# training. BOTH default to 'xla': the kernel is a measured NEGATIVE on
# this chip (PERF.md round 3 — ViT encode 1204 vs 1537 f/s, train step
# 227.3 vs 239.6 seg/s). The VMEM tiling that forced the huge stem GNs
# (c=32/64 lane-padded to 128) off the kernel leaves only mid-pyramid
# sites, where XLA's stats+normalize fusions are already near traffic-
# optimal and the kernel's one-program-per-image grid pipelines worse.
# Kept selectable for other shapes/hardware (BENCH_GN knob).
BACKEND = "xla"
TRAIN_BACKEND = "xla"


def kernel_supported(hw: int, c: int, num_groups: int, itemsize: int,
                     has_residual: bool) -> bool:
    """One grid step holds x (in dtype + an fp32 working copy), the
    optional residual, and the output, double-buffered by Mosaic.

    VMEM is tiled: the lane dimension (c) is padded to 128 and the sublane
    dimension (hw) to 8, so narrow-channel slabs cost far more than their
    logical bytes — the 32-channel stem GN at 192x352 inputs is logically
    0.5 MB but holds two 8.65 MB fp32 temps once padded (measured: Mosaic
    scoped-vmem OOM, 16.52M > 16M limit). Estimate with PADDED shapes."""
    if c % num_groups != 0 or c % 8 != 0:
        return False
    hw_eff = -(-hw // 8) * 8
    c_eff = -(-c // 128) * 128
    slab = hw_eff * c_eff
    blocks = slab * itemsize * (3 if has_residual else 2)  # x, out, (res)
    interm = 2 * slab * 4                                  # xf + one temp
    return 2 * blocks + interm <= _VMEM_BUDGET


_STATS_SUBLANES = 8  # stats blocks are (8, G): Mosaic needs sublane dim 8


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, mean_ref, rstd_ref, *,
               num_groups: int, epsilon: float, relu: bool,
               res_ref=None):
    """One program = one batch row. x_ref [1, HW, C]; g/b [1, C];
    o_ref [1, HW, C]; mean/rstd [1, 8, G] f32 (rows replicated);
    res_ref [1, HW, C] or None."""
    xf = x_ref[0].astype(jnp.float32)                    # [HW, C]
    hw, c = xf.shape
    cpg = c // num_groups

    # channel sums first (one row-reduction), then the per-group fold.
    # Mosaic cannot shape-cast [C] -> [G, Cpg] in-register, so the fold
    # and the broadcast-back both go through a tiny 0/1 group-membership
    # matmul instead of reshape/repeat.
    s1 = jnp.sum(xf, axis=0, keepdims=True)               # [1, C]
    s2 = jnp.sum(jnp.square(xf), axis=0, keepdims=True)   # [1, C]
    member = (jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cpg
              == jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
              ).astype(jnp.float32)                       # [C, G]
    n = jnp.float32(hw * cpg)
    mean_g = jnp.dot(s1, member) / n                      # [1, G]
    var_g = jnp.dot(s2, member) / n - jnp.square(mean_g)
    rstd_g = jax.lax.rsqrt(var_g + epsilon)
    mean_ref[0] = jnp.broadcast_to(mean_g, (_STATS_SUBLANES, num_groups))
    rstd_ref[0] = jnp.broadcast_to(rstd_g, (_STATS_SUBLANES, num_groups))

    # same association as norms._gn_fwd_math: xn = (x - mean) * rstd,
    # out = xn * gamma + beta — keeps the two paths bit-identical
    gamma = g_ref[0].astype(jnp.float32)
    beta = b_ref[0].astype(jnp.float32)
    member_t = (jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 1) // cpg
                == jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 0)
                ).astype(jnp.float32)                     # [G, C]
    mean_c = jnp.dot(mean_g, member_t)                    # [1, C] (exact:
    rstd_c = jnp.dot(rstd_g, member_t)                    # one 1 per column)
    xn = (xf - mean_c) * rstd_c
    out = (xn * gamma[None, :] + beta[None, :]).astype(o_ref.dtype)
    if res_ref is not None:
        out = out + res_ref[0]
    if relu:
        out = jnp.maximum(out, jnp.zeros((), out.dtype))
    o_ref[0] = out


def _gn_pallas(x3, gamma, beta, residual3, *, num_groups: int,
               epsilon: float, relu: bool):
    b, hw, c = x3.shape
    g2 = gamma.reshape(1, c)
    b2 = beta.reshape(1, c)
    args = [x3, g2, b2]
    in_specs = [
        pl.BlockSpec((1, hw, c), lambda bi: (bi, 0, 0)),
        pl.BlockSpec((1, c), lambda bi: (0, 0)),
        pl.BlockSpec((1, c), lambda bi: (0, 0)),
    ]
    if residual3 is not None:
        args.append(residual3)
        in_specs.append(pl.BlockSpec((1, hw, c), lambda bi: (bi, 0, 0)))

    if residual3 is not None:
        def kernel(x_ref, g_ref, b_ref, r_ref, o_ref, m_ref, s_ref):
            _gn_kernel(x_ref, g_ref, b_ref, o_ref, m_ref, s_ref,
                       num_groups=num_groups, epsilon=epsilon, relu=relu,
                       res_ref=r_ref)
    else:
        kernel = functools.partial(_gn_kernel, num_groups=num_groups,
                                   epsilon=epsilon, relu=relu)

    out, mean, rstd = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, hw, c), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, _STATS_SUBLANES, num_groups),
                         lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, _STATS_SUBLANES, num_groups),
                         lambda bi: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((b, _STATS_SUBLANES, num_groups),
                                 jnp.float32),
            jax.ShapeDtypeStruct((b, _STATS_SUBLANES, num_groups),
                                 jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*args)
    return out, mean[:, 0, :], rstd[:, 0, :]


def _unfused(x, gamma, beta, residual, num_groups, epsilon, relu):
    out = norms.group_norm(x, gamma, beta, num_groups, epsilon)
    if residual is not None:
        out = out + residual
    if relu:
        out = jnp.maximum(out, jnp.zeros((), out.dtype))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gn_act_p(x, gamma, beta, residual, num_groups, epsilon, relu):
    out, _, _ = _fwd_impl(x, gamma, beta, residual, num_groups, epsilon,
                          relu)
    return out


def _fwd_impl(x, gamma, beta, residual, num_groups, epsilon, relu):
    b = x.shape[0]
    c = x.shape[-1]
    x3 = x.reshape(b, -1, c)
    r3 = residual.reshape(b, -1, c) if residual is not None else None
    out, mean, rstd = _gn_pallas(x3, gamma, beta, r3,
                                 num_groups=num_groups, epsilon=epsilon,
                                 relu=relu)
    return out.reshape(x.shape), mean, rstd


def _gn_act_fwd(x, gamma, beta, residual, num_groups, epsilon, relu):
    out, mean, rstd = _fwd_impl(x, gamma, beta, residual, num_groups,
                                epsilon, relu)
    # reshape stats to norms.py's [B, 1, G, 1] keepdims layout
    b = x.shape[0]
    mean4 = mean.reshape(b, 1, num_groups, 1)
    rstd4 = rstd.reshape(b, 1, num_groups, 1)
    return out, (x, gamma, mean4, rstd4, out if relu else None,
                 residual is not None)


def _gn_act_bwd(num_groups, epsilon, relu, res, dy):
    x, gamma, mean4, rstd4, out, has_res = res
    dyf = dy
    if relu:
        dyf = jnp.where(out > 0, dy, jnp.zeros((), dy.dtype))
    dres = dyf if has_res else None
    # identical math to norms._gn_bwd with the saved one-pass stats
    xf = norms._gn_reshape(x, num_groups)
    x_hat = (xf - mean4) * rstd4
    dyg = norms._gn_reshape(dyf, num_groups)
    c = x.shape[-1]
    dgamma = jnp.sum(dyg * x_hat, axis=(0, 1)).reshape(c)
    dbeta = jnp.sum(dyg, axis=(0, 1)).reshape(c)
    gamma_g = gamma.astype(jnp.float32).reshape(1, 1, num_groups, -1)
    dx_hat = dyg * gamma_g
    m1 = jnp.mean(dx_hat, axis=(1, 3), keepdims=True)
    m2 = jnp.mean(dx_hat * x_hat, axis=(1, 3), keepdims=True)
    dx = (rstd4 * (dx_hat - m1 - x_hat * m2)).reshape(x.shape).astype(x.dtype)
    return dx, dgamma, dbeta, dres


_gn_act_p.defvjp(_gn_act_fwd, _gn_act_bwd)


def group_norm_act(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   *, residual: Optional[jnp.ndarray] = None,
                   num_groups: int = 32, epsilon: float = 1e-4,
                   relu: bool = False,
                   backend: str = "auto") -> jnp.ndarray:
    """``relu(group_norm(x) + residual)`` in one kernel where supported.

    backend: 'auto' (kernel on TPU when the shape fits), 'xla' (always the
    unfused composition), 'pallas' (force the kernel — interpret tests).
    The unfused path is ops/norms.group_norm + add + relu, so both paths
    share the reference GN semantics (utils/model_utils.py:133-222)."""
    hw = 1
    for d in x.shape[1:-1]:
        hw *= d
    ok = kernel_supported(hw, x.shape[-1], num_groups,
                          jnp.dtype(x.dtype).itemsize,
                          residual is not None)
    use = backend == "pallas" or (backend == "auto" and ok
                                  # 'axon' = this image's remote-TPU
                                  # platform name (see ops/attention.py)
                                  and jax.default_backend() in ("tpu",
                                                                "axon"))
    if use:
        return _gn_act_p(x, gamma, beta, residual, num_groups, epsilon,
                         relu)
    return _unfused(x, gamma, beta, residual, num_groups, epsilon, relu)
