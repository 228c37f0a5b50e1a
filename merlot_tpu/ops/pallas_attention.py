"""Fused multi-head attention as a Pallas TPU kernel.

Why a kernel: the XLA path has TWO consumers of the softmax probs — the
context matmul and (in the lang tower) the per-key attention-mass colsum
that guides SpanBERT masking (reference: model/modeling.py:425-437). Two
consumers defeat XLA's softmax fusion, so [B, H, S, S] fp32 probs round-trip
through HBM every layer (~100 MB/layer at pretrain shapes). This kernel
keeps the whole score block in VMEM, feeds the MXU directly, and accumulates
the colsum on the fly; nothing bigger than [q_blk, S] ever exists.

Design (sequences here are short: 266-512 tokens):
  * grid (B, H, num_q_blocks): one program owns a [q_blk, S] score tile —
    the full key axis fits VMEM, so no online-softmax running maxes needed;
  * scores fp32 on the MXU (preferred_element_type), mask applied with the
    reference's ``s*m - 1e10*(1-m)`` semantics, softmax fp32, probs cast to
    bf16 for the context matmul;
  * colsum output [B, S] is revisited across (h, q_blk) grid steps and
    accumulated in place (head-meaned to match the reference's
    compress_attn pipeline);
  * inputs are padded to lane-aligned lengths by the wrapper; padded keys
    are excluded via the mask (or a synthesized one when mask=None).

Backward: jax.custom_vjp with a recompute-based XLA backward (flash-style
remat — the fwd never saved the probs, so bwd rebuilds them blockwise inside
one fused XLA computation). A full Pallas backward is a later optimization.

KNOWN QUIRK (documented divergence, like the repo's other quirk notes): for
a FULLY-MASKED real query row (all-pad text) the ``s*m - 1e10*(1-m)``
fallback softmaxes to uniform over the LANE-PADDED length s_pad, while the
XLA path is uniform over the true s — so such rows contribute 1/s_pad
instead of 1/s per key to collect='colsum' attention mass. Nothing consumes
those rows' context outputs, and no default path runs pallas with colsum;
the divergence only matters if the pallas backend is explicitly selected
for the lang tower. Renormalizing over the first s columns would cost a
per-row select on every block for a row class that carries no signal.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_PENALTY = 1e10
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_COLSUM_SUBLANES = 8  # replicated rows so the colsum block is (8, lanes)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, colsum_ref, *,
                 scale: float, num_heads: int, collect_colsum: bool,
                 seq_len: int, q_blk: int):
    h = pl.program_id(1)
    qb = pl.program_id(2)

    q = q_ref[0]                        # [q_blk, D] bf16/f32
    k = k_ref[0]                        # [S, D]
    v = v_ref[0]                        # [S, D]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [q_blk, S]

    m = mask_ref[0]                     # [q_blk, S] f32
    scores = scores * m - MASK_PENALTY * (1.0 - m)

    smax = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - smax)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / denom              # fp32 [q_blk, S]

    ctx = jax.lax.dot_general(
        probs.astype(q.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = ctx.astype(o_ref.dtype)

    if collect_colsum:
        # exclude PADDED query rows (row id >= seq_len) — the reference sums
        # every real row, including invalid ones (their uniform mass)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 0) \
            + qb * q_blk
        probs_real = jnp.where(row_ids < seq_len, probs, 0.0)
        partial = jnp.sum(probs_real, axis=0, keepdims=True) / num_heads
        partial = jnp.broadcast_to(partial, (_COLSUM_SUBLANES, partial.shape[1]))

        @pl.when((h == 0) & (qb == 0))
        def _():
            colsum_ref[0] = jnp.zeros_like(colsum_ref[0])

        colsum_ref[0] = colsum_ref[0] + partial


def _flash_fwd(q, k, v, mask, *, collect_colsum: bool, q_blk: int = 256):
    """Padded, gridded pallas_call. q/k/v [B, S, H, D]; mask [B, S, S] or None.

    Layout: heads fold into the batch grid dim ([B*H, S, D] refs) so block
    shapes satisfy the TPU (8, 128) tiling rule; D stays unpadded (block dim
    equal to the array dim is allowed)."""
    b, s, h, d = q.shape
    s_pad = _round_up(s, LANE)
    # q_blk must divide s_pad exactly (the grid would silently drop the
    # remainder rows otherwise); s_pad is always a multiple of LANE
    q_blk = min(q_blk, s_pad)
    while s_pad % q_blk:
        q_blk -= LANE
    assert q_blk >= LANE

    if mask is None:
        # only key padding needs masking
        valid = (jnp.arange(s_pad) < s).astype(jnp.float32)
        mask_p = jnp.broadcast_to(valid[None, None], (b, s_pad, s_pad))
    else:
        mask_p = jnp.pad(mask.astype(jnp.float32),
                         ((0, 0), (0, s_pad - s), (0, s_pad - s)))

    def fold(x):  # [B, S, H, D] -> [B*H, S_pad, D]
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(b * h, s_pad, d)

    qp, kp, vp = fold(q), fold(k), fold(v)
    grid = (b, h, s_pad // q_blk)

    fold_idx = lambda bi, hi, qi, _h=h: (bi * _h + hi, qi, 0)
    kv_idx = lambda bi, hi, qi, _h=h: (bi * _h + hi, 0, 0)
    in_specs = [
        pl.BlockSpec((1, q_blk, d), fold_idx),
        pl.BlockSpec((1, s_pad, d), kv_idx),
        pl.BlockSpec((1, s_pad, d), kv_idx),
        pl.BlockSpec((1, q_blk, s_pad), lambda bi, hi, qi: (bi, qi, 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
                  jax.ShapeDtypeStruct((b, _COLSUM_SUBLANES, s_pad),
                                       jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, q_blk, d), fold_idx),
        pl.BlockSpec((1, _COLSUM_SUBLANES, s_pad),
                     lambda bi, hi, qi: (bi, 0, 0)),
    ]

    kernel = functools.partial(_attn_kernel, scale=1.0 / (d ** 0.5),
                               num_heads=h, collect_colsum=collect_colsum,
                               seq_len=s, q_blk=q_blk)
    ctx, colsum = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )(qp, kp, vp, mask_p)

    ctx = ctx.reshape(b, h, s_pad, d).transpose(0, 2, 1, 3)[:, :s]
    colsum = colsum[:, 0, :s] if collect_colsum else None
    return ctx, colsum


# ----------------------------------------------------------------------
# fused backward kernel
# ----------------------------------------------------------------------
def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, gcol_ref,
                     dq_ref, dk_ref, dv_ref, *,
                     scale: float, num_heads: int, use_gcol: bool,
                     seq_len: int, q_blk: int):
    """Flash-style backward: recompute probs blockwise in VMEM, never
    materialize [S, S] in HBM. dK/dV accumulate across q-block grid steps
    in revisited output blocks.

      dV = P^T dO
      dP = dO V^T (+ g_colsum/H broadcast over real query rows)
      dS = P * (dP - rowsum(dP * P)); dS_raw = dS * mask * scale
      dQ = dS_raw K ; dK = dS_raw^T Q
    """
    qb = pl.program_id(2)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)             # [q_blk, D]
    m = mask_ref[0]                                # [q_blk, S]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    scores = scores * m - MASK_PENALTY * (1.0 - m)
    smax = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - smax)
    probs = unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)   # [q_blk, S]

    # dP
    dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if use_gcol:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 0) \
            + qb * q_blk
        gcol = gcol_ref[0, 0, :][None] / num_heads            # [1, S]
        dp = dp + jnp.where(row_ids < seq_len, gcol, 0.0)

    dsum = jnp.sum(dp * probs, axis=-1, keepdims=True)
    ds = probs * (dp - dsum)
    ds_raw = ds * m * scale                                    # [q_blk, S]

    dq = jax.lax.dot_general(ds_raw.astype(q.dtype), k,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)

    dv_part = jax.lax.dot_general(probs.astype(q.dtype), do.astype(q.dtype),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dk_part = jax.lax.dot_general(ds_raw.astype(q.dtype), q,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(qb == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] = dk_ref[0] + dk_part.astype(dk_ref.dtype)
    dv_ref[0] = dv_ref[0] + dv_part.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, mask, g_ctx, g_colsum, *, collect_colsum: bool,
               q_blk: int = 256):
    b, s, h, d = q.shape
    s_pad = _round_up(s, LANE)
    q_blk = min(q_blk, s_pad)
    while s_pad % q_blk:
        q_blk -= LANE

    if mask is None:
        valid = (jnp.arange(s_pad) < s).astype(jnp.float32)
        mask_p = jnp.broadcast_to(valid[None, None], (b, s_pad, s_pad))
    else:
        mask_p = jnp.pad(mask.astype(jnp.float32),
                         ((0, 0), (0, s_pad - s), (0, s_pad - s)))

    def fold(x):
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        return x.transpose(0, 2, 1, 3).reshape(b * h, s_pad, d)

    qp, kp, vp, dop = fold(q), fold(k), fold(v), fold(g_ctx)
    if collect_colsum and g_colsum is not None:
        gcol = jnp.pad(g_colsum.astype(jnp.float32), ((0, 0), (0, s_pad - s)))
        gcol = jnp.broadcast_to(gcol[:, None], (b, _COLSUM_SUBLANES, s_pad))
    else:
        gcol = jnp.zeros((b, _COLSUM_SUBLANES, s_pad), jnp.float32)

    grid = (b, h, s_pad // q_blk)
    fold_idx = lambda bi, hi, qi, _h=h: (bi * _h + hi, qi, 0)
    kv_idx = lambda bi, hi, qi, _h=h: (bi * _h + hi, 0, 0)
    in_specs = [
        pl.BlockSpec((1, q_blk, d), fold_idx),      # q
        pl.BlockSpec((1, s_pad, d), kv_idx),        # k
        pl.BlockSpec((1, s_pad, d), kv_idx),        # v
        pl.BlockSpec((1, q_blk, s_pad), lambda bi, hi, qi: (bi, qi, 0)),
        pl.BlockSpec((1, q_blk, d), fold_idx),      # dO
        pl.BlockSpec((1, _COLSUM_SUBLANES, s_pad),
                     lambda bi, hi, qi: (bi, 0, 0)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
                  jax.ShapeDtypeStruct((b * h, s_pad, d), jnp.float32),
                  jax.ShapeDtypeStruct((b * h, s_pad, d), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, q_blk, d), fold_idx),      # dQ
        pl.BlockSpec((1, s_pad, d), kv_idx),        # dK (revisited over qb)
        pl.BlockSpec((1, s_pad, d), kv_idx),        # dV
    ]

    kernel = functools.partial(_attn_bwd_kernel, scale=1.0 / (d ** 0.5),
                               num_heads=h,
                               use_gcol=collect_colsum and g_colsum is not None,
                               seq_len=s, q_blk=q_blk)
    dq, dk, dv = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )(qp, kp, vp, mask_p, dop, gcol)

    def unfold(x, dtype):
        x = x.reshape(b, h, s_pad, d).transpose(0, 2, 1, 3)[:, :s]
        return x.astype(dtype)

    return unfold(dq, q.dtype), unfold(dk, k.dtype), unfold(dv, v.dtype)


# ----------------------------------------------------------------------
# custom VJP
# ----------------------------------------------------------------------
def _attention_reference(q, k, v, mask):
    """Plain XLA attention used for the recompute backward."""
    d = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (d ** 0.5)
    if mask is not None:
        m = mask.astype(jnp.float32)[:, None]
        scores = scores * m - MASK_PENALTY * (1.0 - m)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    colsum = jnp.sum(probs, axis=(1, 2)) / q.shape[2]
    return ctx, colsum


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_p(q, k, v, mask, collect_colsum: bool):
    ctx, colsum = _flash_fwd(q, k, v, mask, collect_colsum=collect_colsum)
    if colsum is None:
        colsum = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    return ctx, colsum


def _fwd(q, k, v, mask, collect_colsum):
    out = flash_attention_p(q, k, v, mask, collect_colsum)
    return out, (q, k, v, mask)


def _bwd(collect_colsum, residuals, grads):
    q, k, v, mask = residuals
    g_ctx, g_colsum = grads
    dq, dk, dv = _flash_bwd(q, k, v, mask, g_ctx, g_colsum,
                            collect_colsum=collect_colsum)
    return dq, dk, dv, None


flash_attention_p.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, mask, *, collect: str = "none"
                    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """attention_core-compatible entry point (collect: 'none' | 'colsum')."""
    assert collect in ("none", "colsum")
    ctx, colsum = flash_attention_p(q, k, v, mask, collect == "colsum")
    return ctx, (colsum if collect == "colsum" else None)
