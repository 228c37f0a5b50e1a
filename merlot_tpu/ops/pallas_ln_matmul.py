"""Fused LayerNorm + matmul (the pre-LN projection epilogue) as a Pallas
TPU kernel.

Why: every pre-LN transformer layer computes ``z = LN(x)`` and immediately
feeds z to matmuls (q/k/v projections after attn_ln, the intermediate
matmul after mlp_ln — reference: utils/transformer.py:193-221). XLA cannot
fuse an elementwise producer INTO a dot's operand read on TPU, so z is
materialized in HBM and re-read by every consumer: for the ViT tower at
pretrain shapes that is a [34048, 768] bf16 write plus three reads per
attention LN per layer (~200 MB/layer of pure normalize traffic). This
kernel reads x once per row-block, computes the LN statistics in VMEM
(fp32, the two-term ``x*s - mean*s + beta`` form of ops/norms.py so the
bf16 rounding pattern matches the reference), and runs the J consumer
matmuls on the VMEM-resident normalized block — z never exists in HBM.

Forward = this kernel; backward = XLA einsums that recompute z from
(x, mean, rstd) — the same residuals the norms.py custom VJP keeps, so
activation memory SHRINKS vs the unfused path (z is no longer a stored
residual).

The public entry ``ln_matmul`` transparently falls back to the exact
unfused math (ops.norms.layer_norm + jnp.dot, bit-identical to the
LayerNorm->DenseTN module path) when the kernel does not support the
shape or the backend is not TPU, so callers can call it unconditionally.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from merlot_tpu.ops import norms

# flipped by tests to exercise the kernel on CPU via the interpreter
INTERPRET = False

_VMEM_BUDGET = 11 << 20
MAX_K = 2048


def _pick_block(m: int, candidates=(512, 384, 256, 128, 64, 32, 16)
                ) -> Optional[int]:
    for c in candidates:
        if c <= m and m % c == 0:
            return c
    return None


def _vmem_est(blk_m: int, k: int, n: int, j: int, itemsize: int) -> int:
    # streamed blocks (double-buffered by Mosaic) + resident weights
    streamed = (blk_m * k * itemsize              # x in
                + j * blk_m * n * itemsize)       # outputs
    resident = j * k * n * itemsize + j * n * itemsize + 2 * k * 4
    interm = 3 * blk_m * k * 4                    # xf / scale / z fp32 temps
    return 2 * streamed + resident + interm


def kernel_supported(m: int, k: int, n: int, itemsize: int = 2,
                     j: int = 1) -> Optional[Tuple[int, int]]:
    """Returns (blk_m, n_blk) when the kernel handles [m,k]x(k,n) for j
    consumer matmuls, else None (caller falls back to unfused math)."""
    if k > MAX_K or k % 128 != 0 or n % 128 != 0:
        return None
    blk_m = _pick_block(m)
    if blk_m is None:
        return None
    n_blk = _pick_block(n, (1024, 768, 512, 384, 256, 128)) or n
    while _vmem_est(blk_m, k, n, j, itemsize) > _VMEM_BUDGET:
        if blk_m > 16:
            blk_m //= 2
            if m % blk_m != 0:
                return None
            continue
        return None
    return blk_m, n_blk


def _ln_mm_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *,
                  epsilon: float, cdtype, j_n: int, n: int, n_blk: int):
    """Grid (M/blk_m,); x block [blk_m, K]; w [J, K, N] whole-array
    resident (constant index map -> fetched ONCE for the whole sweep);
    bias [J, 1, N]; o block [J, blk_m, N]. The LN runs once per m-block;
    the J*N/n_blk consumer matmul tiles read the register/VMEM-resident
    normalized block."""
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + epsilon)
    scale = rstd * g_ref[0].astype(jnp.float32)[None, :]
    z = (xf * scale - mean * scale
         + b_ref[0].astype(jnp.float32)[None, :]).astype(cdtype)

    for j in range(j_n):
        for nb in range(n // n_blk):
            sl = slice(nb * n_blk, (nb + 1) * n_blk)
            y = jax.lax.dot_general(z, w_ref[j, :, sl],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[j, :, sl] = (y.astype(o_ref.dtype)
                               + bias_ref[j, :, sl].astype(o_ref.dtype))


def _ln_mm_pallas(x2, gamma, beta, ws, bs, *, epsilon: float,
                  blk_m: int, n_blk: int):
    """x2 [M, K] compute dtype; ws [J, K, N] compute dtype; bs [J, 1, N].
    Returns [J, M, N] compute dtype."""
    m, k = x2.shape
    jn, _, n = ws.shape
    cdtype = x2.dtype
    grid = (m // blk_m,)

    return pl.pallas_call(
        functools.partial(_ln_mm_kernel, epsilon=epsilon, cdtype=cdtype,
                          j_n=jn, n=n, n_blk=n_blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk_m, k), lambda mi: (mi, 0)),
            pl.BlockSpec((1, k), lambda mi: (0, 0)),
            pl.BlockSpec((1, k), lambda mi: (0, 0)),
            pl.BlockSpec((jn, k, n), lambda mi: (0, 0, 0)),
            pl.BlockSpec((jn, 1, n), lambda mi: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((jn, blk_m, n), lambda mi: (0, mi, 0)),
        out_shape=jax.ShapeDtypeStruct((jn, m, n), cdtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=INTERPRET,
    )(x2, gamma.reshape(1, k), beta.reshape(1, k), ws, bs)


def ln_matmul(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
              kernels: Sequence[jnp.ndarray],
              biases: Sequence[jnp.ndarray],
              epsilon: float = 1e-5) -> Tuple[jnp.ndarray, ...]:
    """``tuple(LN(x) @ W_j + b_j)`` with the LN fused into the matmuls.

    x [..., K] (compute dtype); gamma/beta [K] fp32; each W_j [K, N] fp32
    master weights (all N equal), b_j [N] fp32. Falls back to the exact
    unfused math (norms.layer_norm + DenseTN's dot, bit-identical) when
    the kernel does not support the shape/backend.
    """
    k = x.shape[-1]
    n = kernels[0].shape[-1]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    same_n = all(w.shape == (k, n) for w in kernels)
    # 'axon' = this image's remote-TPU platform name (see ops/attention.py)
    on_tpu = jax.default_backend() in ("tpu", "axon") or INTERPRET
    sup = kernel_supported(m, k, n, jnp.dtype(x.dtype).itemsize,
                           j=len(kernels)) \
        if (on_tpu and same_n) else None
    if sup is None:
        z = norms.layer_norm(x, gamma, beta, epsilon)
        cdtype = x.dtype
        return tuple(
            jnp.dot(z, w.astype(cdtype), preferred_element_type=cdtype)
            + b.astype(cdtype)
            for w, b in zip(kernels, biases))
    blk_m, n_blk = sup
    ws = jnp.stack([w.astype(jnp.float32) for w in kernels])
    bs = jnp.stack([b.astype(jnp.float32) for b in biases])
    y = _ln_matmul_full(x, gamma.astype(jnp.float32),
                        beta.astype(jnp.float32), ws, bs, epsilon,
                        blk_m, n_blk)
    return tuple(y[j] for j in range(len(kernels)))


# ----------------------------------------------------------------------
# the real custom_vjp (residuals carry beta)
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ln_matmul_full(x, gamma, beta, ws, bs, epsilon, blk_m, n_blk):
    lead = x.shape[:-1]
    k = x.shape[-1]
    cdtype = x.dtype
    y = _ln_mm_pallas(x.reshape(-1, k), gamma, beta,
                      ws.astype(cdtype), bs.astype(cdtype)[:, None, :],
                      epsilon=epsilon, blk_m=blk_m, n_blk=n_blk)
    return y.reshape((ws.shape[0],) + lead + (ws.shape[-1],))


def _full_fwd(x, gamma, beta, ws, bs, epsilon, blk_m, n_blk):
    y = _ln_matmul_full(x, gamma, beta, ws, bs, epsilon, blk_m, n_blk)
    return y, (x, gamma, beta, ws)


def _full_bwd(epsilon, blk_m, n_blk, res, dy):
    x, gamma, beta, ws = res
    k = x.shape[-1]
    cdtype = x.dtype
    xf = x.reshape(-1, k).astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + epsilon)
    g32 = gamma.astype(jnp.float32)
    scale = rstd * g32[None, :]
    # the exact forward z (two-term form + beta), recomputed
    z = (xf * scale - mean * scale
         + beta.astype(jnp.float32)[None, :]).astype(cdtype)

    jn, _, n = ws.shape
    dy2 = dy.reshape(jn, -1, n)
    wc = ws.astype(cdtype)

    # weight/bias grads: one batched einsum over the J consumers
    dws = jnp.einsum("mk,jmn->jkn", z, dy2,
                     preferred_element_type=jnp.float32)
    dbs = jnp.sum(dy2.astype(jnp.float32), axis=1)

    # dz summed over consumers, then the layer_norm backward (norms.py)
    dz = jnp.einsum("jmn,jkn->mk", dy2, wc,
                    preferred_element_type=jnp.float32)
    x_hat = (xf - mean) * rstd
    dgamma = jnp.sum(dz * x_hat, axis=0)
    dbeta = jnp.sum(dz, axis=0)
    dx_hat = dz * g32[None, :]
    m1 = jnp.mean(dx_hat, axis=1, keepdims=True)
    m2 = jnp.mean(dx_hat * x_hat, axis=1, keepdims=True)
    dx = (rstd * (dx_hat - m1 - x_hat * m2)).astype(cdtype).reshape(x.shape)
    return dx, dgamma, dbeta, dws, dbs


_ln_matmul_full.defvjp(_full_fwd, _full_bwd)
