"""Fused multi-head attention as a Pallas TPU kernel (v2).

Why a kernel: XLA's attention at MERLOT's sequence lengths (266-512) pays
three taxes the matmuls don't need: (1) layout copies transposing
[B, S, H*D] projections into [B, H, S, D] batched-matmul form (~0.5 ms/layer
measured at pretrain shapes), (2) HBM round-trips of the [B, H, S, S]
scores/probs tensors through the softmax chain, and (3) a second consumer
(the lang tower's attention-mass colsum, reference: model/modeling.py:425-437)
that defeats softmax fusion entirely.

v2 design (replaces the round-1 kernel, which lost to XLA — see PERF.md):
  * programs own a [q_blk, S] tile of ONE image/group and loop the heads
    IN-KERNEL: inputs stay in the natural [B, S, H*D] projection layout
    (no transposes anywhere), each head's scores+softmax+context runs
    entirely in VMEM, and the MXU sees [q_blk, D] x [D, S] matmuls.
  * block shapes are logical (no external padding): Mosaic tracks real
    bounds, so softmax denominators are exact — a fully-masked row is
    uniform over the true S, byte-identical to the XLA fallback (the v1
    kernel's pad-length divergence is gone).
  * softmax in bf16 by default (the reference's semantics and the XLA
    path's default; softmax_fp32=True upcasts).
  * collect='colsum' accumulates the head-meaned, query-summed attention
    mass [B, S] on the fly — nothing bigger than [q_blk, S] ever exists.

Measured (v5e, 128 frames x S=266 x 12 heads x 64): ViT tower forward
69.3 -> 53.5 ms vs in-model XLA attention (23% faster end-to-end fwd).

Backward: a fused pallas kernel in the same style (recompute probs in
VMEM, dK/dV accumulated across q-block grid steps in revisited fp32
blocks, VMEM-budgeted q-block sizes, per-head slice writes into the
output blocks so no head-concat temps sit on the scoped-VMEM stack).
Ships as the TRAINING default in every tower (training_backend() ->
'pallas'): same-session tower fwd+bwd A/B vit 239.7 -> 171.6 ms, joint
111.0 -> 72.8, lang 29.7 -> 26.5; full pretrain step 254.9 -> 271.7
seg/s/chip (PERF.md round 3).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (interpret tests)

MASK_PENALTY = 1e10

# Experiment knob (round 5): run the backward kernel's four gradient
# dots with bf16 OPERANDS + f32 accumulation instead of f32 operands.
# Numerically this is exactly what XLA's own backward of a bf16 forward
# does (operands bf16, preferred_element_type f32); the f32-operand form
# predates the round-5 per-op ledger, which showed the backward ~2x
# further from the MXU ceiling than the forward. Default off until the
# chip A/B (tools/bench_attn_variants.py / PERF.md round 5) records it.
import os as _os
BWD_BF16_DOTS = _os.environ.get("ATTN_BWD_BF16_DOTS", "0") == "1"

_COLSUM_SUBLANES = 8  # replicated rows so the colsum block is (8, lanes)
MAX_KERNEL_SEQ = 2048  # VMEM budget guard; longer sequences fall back to XLA

# Backward implementation, consulted at trace time:
#   'pallas'        — the fused backward kernel (fastest; the shipping
#                     training default in every tower — the round-2
#                     "crashes in full-model grad programs" was a Mosaic
#                     scoped-vmem OOM, fixed by padded-shape q-block
#                     sizing + the VMEM diet)
#   'xla_probs'     — the forward kernel EMITS the probs tensor (exactly what
#                     XLA's own backward saves), and the backward is pure XLA
#                     einsums with no recompute: the kernel's forward win
#                     (no transposes, fused softmax) + XLA's cheap
#                     saved-probs backward. Compiles inside full-model grad
#                     programs (only the bwd kernel crashes the helper).
#   'xla_recompute' — flash-style recompute through an XLA-equivalent
#                     forward (one fused XLA computation, no saved probs)
BWD_MODE = "pallas"


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, colsum_ref,
                 probs_ref=None, *,
                 num_heads: int, d_head: int, scale: float,
                 softmax_fp32: bool, collect_colsum: bool,
                 sq: int, q_blk: int):
    """One program: rows [qb*q_blk, ...) of one batch element, all heads.

    q_ref  [1, q_blk, H*D]; k_ref/v_ref [1, Sk, H*D];
    mask_ref [1, q_blk, Sk] f32 (1=attend) or None;
    o_ref  [1, q_blk, H*D]; colsum_ref [1, 8, Sk] f32 or None;
    probs_ref [1, q_blk, H*Sk] sm_dtype or None (saved-probs backward).

    v_ref=None selects the stacked-KV convention (serving KV cache): k_ref
    is [1, Sk, 2*H*D] with keys in columns [:H*D] and values in
    [H*D:] — one input block, one HBM buffer, no separate v stream.
    """
    qb = pl.program_id(1)
    qq = q_ref[0]
    kk = k_ref[0]
    vv = v_ref[0] if v_ref is not None else kk
    v_base = 0 if v_ref is not None else num_heads * d_head
    m = mask_ref[0] if mask_ref is not None else None

    sm_dtype = jnp.float32 if softmax_fp32 else qq.dtype

    colsum_acc = None
    outs = []
    probs_out = []
    for h in range(num_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        scores = jax.lax.dot_general(
            qq[:, sl], kk[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [q_blk, Sk] f32
        scores = scores.astype(sm_dtype)
        if m is not None:
            mm = m.astype(sm_dtype)
            scores = scores * mm - jnp.asarray(MASK_PENALTY, sm_dtype) * (1 - mm)
        probs = jax.nn.softmax(scores, axis=-1)
        vsl = slice(v_base + h * d_head, v_base + (h + 1) * d_head)
        ctx = jax.lax.dot_general(
            probs.astype(qq.dtype), vv[:, vsl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append(ctx.astype(o_ref.dtype))
        if probs_ref is not None:
            probs_out.append(probs.astype(probs_ref.dtype))
        if collect_colsum:
            p32 = probs.astype(jnp.float32)
            # only REAL query rows contribute (the grid may overhang sq)
            row = jax.lax.broadcasted_iota(jnp.int32, p32.shape, 0) \
                + qb * q_blk
            p32 = jnp.where(row < sq, p32, 0.0)
            part = jnp.sum(p32, axis=0, keepdims=True)
            colsum_acc = part if colsum_acc is None else colsum_acc + part

    o_ref[0] = jnp.concatenate(outs, axis=1)
    if probs_ref is not None:
        # [q_blk, H*Sk] row layout — a 4-D [1, H, q_blk, Sk] out block
        # (batched-matmul layout) crashes this environment's remote compile
        # helper at B8; the row layout compiles, and XLA folds the reshape
        # into the backward einsums' operand layouts
        probs_ref[0] = jnp.concatenate(probs_out, axis=1)

    if collect_colsum:
        partial = jnp.broadcast_to(colsum_acc / num_heads,
                                   (_COLSUM_SUBLANES, colsum_acc.shape[1]))

        @pl.when(qb == 0)
        def _():
            colsum_ref[0] = jnp.zeros_like(colsum_ref[0])

        colsum_ref[0] = colsum_ref[0] + partial


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


_FWD_VMEM_BUDGET = 11 << 20
# Decode steps (sq <= 8) have tiny q/o/mask blocks; the footprint is the
# full-cache k/v block, which the 11 MB training/prefill budget caps at
# k_len ~1340 for grover-medium bf16 — below the denoise server's default
# 1537 context, silently costing it the fused-decode win. The real Mosaic
# scoped limit is 16 MB; 14 MB admits k_len up to ~1770 with headroom for
# what the estimate cannot see (validated on-chip at 1537, PERF.md r3).
DECODE_VMEM_BUDGET = 14 << 20


def _fwd_vmem_est(q_blk: int, sk: int, hd: int, num_heads: int,
                  in_bytes: int, has_mask: bool, emit_probs: bool,
                  probs_bytes: int) -> int:
    """Forward-kernel VMEM footprint for one q-block (Mosaic
    double-buffers every in/out block across grid steps)."""
    blocks = (q_blk * hd * in_bytes          # q in
              + 2 * sk * hd * in_bytes       # k + v in
              + q_blk * hd * in_bytes        # o out
              + (q_blk * sk * 4 if has_mask else 0)
              + (q_blk * num_heads * sk * probs_bytes
                 if emit_probs else 0))
    interm = 2 * q_blk * sk * 4              # scores/probs fp32
    return 2 * blocks + interm


def _fwd_q_block(sq: int, sk: int, hd: int, num_heads: int, in_bytes: int,
                 has_mask: bool, emit_probs: bool, probs_bytes: int,
                 budget: int = _FWD_VMEM_BUDGET) -> int:
    """Largest forward q block whose VMEM footprint fits."""
    def est(q_blk: int) -> int:
        return _fwd_vmem_est(q_blk, sk, hd, num_heads, in_bytes, has_mask,
                             emit_probs, probs_bytes)

    if sq <= 512 and est(sq) <= budget:
        return sq
    for q_blk in (512, 384, 256, 128, 64):
        if q_blk <= sq and est(q_blk) <= budget:
            return q_blk
    return 64


def _flash_fwd(q3, k3, v3, mask, *, num_heads: int,
               softmax_fp32: bool, collect_colsum: bool,
               emit_probs: bool = False, budget: Optional[int] = None):
    """q3 [B, Sq, H*D]; k3/v3 [B, Sk, H*D]; mask [B, Sq, Sk] or None.
    emit_probs additionally returns the probs tensor [B, Sq, H, Sk] in
    sm_dtype — the residual for the saved-probs ('xla_probs') backward.

    STACKED-KV convention: v3=None selects it — k3 is then one
    [B, Sk, 2*H*D] buffer with keys in columns [:H*D] and values in
    [H*D:] (the serving cache layout; see flash_attention_stacked).

    ``budget`` is the VMEM budget the q-block sizer works against; it
    MUST match what the caller's ``kernel_supported`` gate used, or the
    launched kernel's footprint can exceed what the gate approved."""
    b, sq, hd = q3.shape
    sk = k3.shape[1]
    d = hd // num_heads
    stacked = v3 is None
    sm_dtype = jnp.float32 if softmax_fp32 else q3.dtype

    q_blk = _fwd_q_block(sq, sk, hd, num_heads, q3.dtype.itemsize,
                         mask is not None, emit_probs,
                         jnp.dtype(sm_dtype).itemsize,
                         budget=budget if budget is not None
                         else _FWD_VMEM_BUDGET)
    n_qb = _ceil_div(sq, q_blk)
    grid = (b, n_qb)

    in_specs = [
        pl.BlockSpec((1, q_blk, hd), lambda bi, qi: (bi, qi, 0)),
    ]
    args = [q3]
    if stacked:
        in_specs.append(
            pl.BlockSpec((1, sk, 2 * hd), lambda bi, qi: (bi, 0, 0)))
        args.append(k3)
    else:
        in_specs.extend([
            pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0)),
        ])
        args.extend([k3, v3])
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, q_blk, sk), lambda bi, qi: (bi, qi, 0)))
        args.append(mask.astype(jnp.float32))

    out_shapes = [jax.ShapeDtypeStruct((b, sq, hd), q3.dtype)]
    out_specs = [pl.BlockSpec((1, q_blk, hd), lambda bi, qi: (bi, qi, 0))]
    if collect_colsum:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, _COLSUM_SUBLANES, sk), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, _COLSUM_SUBLANES, sk), lambda bi, qi: (bi, 0, 0)))
    if emit_probs:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, sq, num_heads * sk), sm_dtype))
        out_specs.append(
            pl.BlockSpec((1, q_blk, num_heads * sk),
                         lambda bi, qi: (bi, qi, 0)))

    def kernel(*refs):
        n_in = len(args)
        ins, outs = refs[:n_in], refs[n_in:]
        k_ref = ins[1]
        v_ref = None if stacked else ins[2]
        m_ref = ins[-1] if mask is not None else None
        o_ref = outs[0]
        c_ref = outs[1] if collect_colsum else None
        p_ref = outs[-1] if emit_probs else None
        _attn_kernel(ins[0], k_ref, v_ref, m_ref, o_ref, c_ref, p_ref,
                     num_heads=num_heads, d_head=d, scale=1.0 / (d ** 0.5),
                     softmax_fp32=softmax_fp32,
                     collect_colsum=collect_colsum, sq=sq, q_blk=q_blk)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)

    ctx = outs[0]
    colsum = outs[1][:, 0, :] if collect_colsum else None
    probs = (outs[-1].reshape(b, sq, num_heads, sk)
             if emit_probs else None)           # [B, Sq, H, Sk]
    return ctx, colsum, probs


# ----------------------------------------------------------------------
# fused backward kernel (v2 style: heads in-kernel, natural layout)
# ----------------------------------------------------------------------
def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref, gcol_ref,
                     dq_ref, dk_ref, dv_ref, *,
                     num_heads: int, d_head: int, scale: float,
                     softmax_fp32: bool, use_gcol: bool,
                     sq: int, q_blk: int):
    """Flash-style backward, one program per (batch, q-block), all heads:
    recompute scores+probs in VMEM (never from HBM), then

      dV += P^T dO
      dP  = dO V^T (+ g_colsum/H over real query rows when colsum was taken)
      dS  = P * (dP - rowsum(dP * P)); dS_masked = dS * m * scale
      dQ  = dS_masked K;   dK += dS_masked^T Q

    dK/dV accumulate across q-block grid steps in revisited fp32 output
    blocks (zeroed at qb == 0). Per-head results are written/accumulated
    DIRECTLY into the output blocks' column slices — no dq/dk/dv
    head-concat temps on the scoped-VMEM stack (the 'VMEM diet': ~2.5 MB
    saved at the joint shape, which is what buys q_blk 64->128 there and
    whole-Sq blocks for the ViT tower)."""
    qb = pl.program_id(1)
    qq = q_ref[0]
    kk = k_ref[0]
    vv = v_ref[0]
    gg = g_ref[0]
    m = mask_ref[0].astype(jnp.float32) if mask_ref is not None else None
    gcol = gcol_ref[0] if use_gcol else None   # [1(+), Sk] f32

    sm_dtype = jnp.float32 if softmax_fp32 else qq.dtype

    @pl.when(qb == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    # global row ids: rows beyond sq are grid overhang whose q/g data is
    # undefined — they must contribute NOTHING to the accumulated dk/dv
    row_valid = (jax.lax.broadcasted_iota(
        jnp.int32, (gg.shape[0], 1), 0) + qb * q_blk < sq)  # [q_blk, 1]

    for h in range(num_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh, kh, vh, gh = qq[:, sl], kk[:, sl], vv[:, sl], gg[:, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s.astype(sm_dtype)
        if m is not None:
            mm = m.astype(sm_dtype)
            s = s * mm - jnp.asarray(MASK_PENALTY, sm_dtype) * (1 - mm)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1) \
            if sm_dtype == jnp.float32 else \
            jax.nn.softmax(s, axis=-1).astype(jnp.float32)  # [q_blk, Sk]
        p = jnp.where(row_valid, p, 0.0)

        bf16_dots = BWD_BF16_DOTS and qq.dtype == jnp.bfloat16
        if bf16_dots:
            # bf16 operands + f32 accumulation: the same mixed precision
            # XLA's own autodiff of a bf16 forward uses. The f32-operand
            # form below predates the round-5 per-op ledger (backward ~2x
            # further from the MXU ceiling than the forward).
            gh_m = jnp.where(row_valid, gh, jnp.zeros_like(gh))
            dv_h = jax.lax.dot_general(p.astype(qq.dtype), gh_m,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(gh_m, vh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        else:
            gh32 = jnp.where(row_valid, gh.astype(jnp.float32), 0.0)
            dv_h = jax.lax.dot_general(p, gh32, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(gh32, vh.astype(jnp.float32),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        if use_gcol:
            # colsum = sum_q p / H over real rows -> dp += gcol/H there
            dp = dp + jnp.where(row_valid, gcol / num_heads, 0.0)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if m is not None:
            ds = ds * m
        ds = ds * scale
        # overhang q rows: ds is 0 there, but q itself is undefined and
        # 0 * undefined = NaN under the contraction — mask q as well
        if bf16_dots:
            ds_c = ds.astype(qq.dtype)
            qh_m = jnp.where(row_valid, qh, jnp.zeros_like(qh))
            dq_h = jax.lax.dot_general(ds_c, kh, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            dk_h = jax.lax.dot_general(ds_c, qh_m, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        else:
            qh32 = jnp.where(row_valid, qh.astype(jnp.float32), 0.0)
            dq_h = jax.lax.dot_general(ds, kh.astype(jnp.float32),
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            dk_h = jax.lax.dot_general(ds, qh32,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        # heads own disjoint column slices of the fp32 output blocks;
        # write/accumulate there directly (no head-concat temps in VMEM)
        dq_ref[0, :, sl] = dq_h
        dk_ref[0, :, sl] = dk_ref[0, :, sl] + dk_h
        dv_ref[0, :, sl] = dv_ref[0, :, sl] + dv_h


_BWD_SCOPED_LIMIT = 16 << 20  # Mosaic's hard scoped-VMEM ceiling


def _bwd_vmem_est(q_blk: int, sk: int, hd: int, in_bytes: int,
                  has_mask: bool) -> int:
    """Backward-kernel VMEM footprint for one q-block. All dims modeled
    PADDED to the VMEM tiling (lanes to 128, sublanes to 8): at ViT shape
    (Sq=Sk=266) the [q_blk, Sk] intermediates really occupy [272, 384]."""
    sk_rows = -(-sk // 8) * 8                      # sublane-padded k rows
    sk_lanes = -(-sk // 128) * 128                 # lane-padded scores dim
    qb = -(-q_blk // 8) * 8
    blocks = (qb * hd * in_bytes * 2               # q + g in
              + 2 * sk_rows * hd * in_bytes        # k + v in
              + qb * hd * 4                        # dq out
              + 2 * sk_rows * hd * 4               # dk + dv outs
              + (qb * sk_lanes * 4 if has_mask else 0))
    interm = 4 * qb * sk_lanes * 4                 # s/p/dp/ds fp32
    return 2 * blocks + interm


def bwd_kernel_fits(sq: int, sk: int, hd: int, in_bytes: int,
                    has_mask: bool) -> bool:
    """True iff the fused pallas backward fits scoped VMEM at its SMALLEST
    q-block. The k/v/dk/dv blocks span the full key length, so a long-sk
    call can exceed the 16 MB limit at any q-block size (hd=768 bf16
    masked crosses it around sk~900); _bwd routes those to the XLA
    recompute backward instead of failing at Mosaic compile time."""
    return _bwd_vmem_est(min(sq, 64), sk, hd, in_bytes,
                         has_mask) <= _BWD_SCOPED_LIMIT


def _bwd_q_block(sq: int, sk: int, hd: int, in_bytes: int,
                 has_mask: bool, budget: int = 12 << 20) -> int:
    """Largest q block whose VMEM footprint fits: Mosaic double-buffers
    every in/out block across grid steps (x2), plus the per-head fp32
    score/prob/dp/ds intermediates on the program's scoped-VMEM stack
    (per-head dq/dk/dv land directly in output-block slices — the VMEM
    diet — so there are no head-concat temps to model).

    The unpadded estimate once admitted q_blk=266 with head-concat temps,
    whose true stack was 17.11 M > the 16 M scoped limit — the
    previously-undiagnosed 'compile helper HTTP 500, no detail' for every
    grad program containing this kernel (PERF.md round 3). Budget is set
    below the hard limit to absorb what the model still cannot see
    (per-head masked copies, Mosaic spills); 12 MB + the diet is
    chip-validated at q_blk=266 whole-Sq ViT blocks and q_blk=128 joint
    blocks. Callers must gate on ``bwd_kernel_fits`` — the final 64
    fallback assumes the smallest block fits."""
    def est(q_blk: int) -> int:
        return _bwd_vmem_est(q_blk, sk, hd, in_bytes, has_mask)

    # a block smaller than the dim must be 8-divisible (Mosaic tiling rule)
    if sq <= 512 and est(sq) <= budget:
        return sq
    for q_blk in (512, 384, 256, 128, 64):
        if q_blk <= sq and est(q_blk) <= budget:
            return q_blk
    return 64


def _flash_bwd_pallas(q3, k3, v3, mask, g3, gcol, *, num_heads: int,
                      softmax_fp32: bool, use_gcol: bool):
    b, sq, hd = q3.shape
    sk = k3.shape[1]
    d = hd // num_heads
    q_blk = _bwd_q_block(sq, sk, hd, q3.dtype.itemsize, mask is not None)
    n_qb = _ceil_div(sq, q_blk)
    grid = (b, n_qb)

    in_specs = [
        pl.BlockSpec((1, q_blk, hd), lambda bi, qi: (bi, qi, 0)),
        pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0)),
        pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0)),
    ]
    args = [q3, k3, v3]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, q_blk, sk), lambda bi, qi: (bi, qi, 0)))
        args.append(mask.astype(jnp.float32))
    in_specs.append(pl.BlockSpec((1, q_blk, hd), lambda bi, qi: (bi, qi, 0)))
    args.append(g3)
    if use_gcol:
        in_specs.append(pl.BlockSpec((1, 1, sk), lambda bi, qi: (bi, 0, 0)))
        args.append(gcol.reshape(b, 1, sk).astype(jnp.float32))

    out_shapes = [jax.ShapeDtypeStruct((b, sq, hd), jnp.float32),
                  jax.ShapeDtypeStruct((b, sk, hd), jnp.float32),
                  jax.ShapeDtypeStruct((b, sk, hd), jnp.float32)]
    out_specs = [pl.BlockSpec((1, q_blk, hd), lambda bi, qi: (bi, qi, 0)),
                 pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0)),
                 pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0))]

    def kernel(*refs):
        ins, outs = refs[:len(args)], refs[len(args):]
        i = 3
        m_ref = None
        if mask is not None:
            m_ref = ins[i]
            i += 1
        g_ref = ins[i]
        i += 1
        gcol_ref = ins[i] if use_gcol else None
        _attn_bwd_kernel(ins[0], ins[1], ins[2], m_ref, g_ref, gcol_ref,
                         outs[0], outs[1], outs[2],
                         num_heads=num_heads, d_head=d,
                         scale=1.0 / (d ** 0.5), softmax_fp32=softmax_fp32,
                         use_gcol=use_gcol, sq=sq, q_blk=q_blk)

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)
    return dq.astype(q3.dtype), dk.astype(k3.dtype), dv.astype(v3.dtype)


# ----------------------------------------------------------------------
# custom_vjp wiring
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_p(q3, k3, v3, mask, num_heads, softmax_fp32, collect_colsum,
             budget):
    ctx, colsum, _ = _flash_fwd(q3, k3, v3, mask, num_heads=num_heads,
                                softmax_fp32=softmax_fp32,
                                collect_colsum=collect_colsum, budget=budget)
    if colsum is None:
        colsum = jnp.zeros((q3.shape[0], k3.shape[1]), jnp.float32)
    return ctx, colsum


def _fwd(q3, k3, v3, mask, num_heads, softmax_fp32, collect_colsum, budget):
    if BWD_MODE == "xla_probs":
        ctx, colsum, probs = _flash_fwd(
            q3, k3, v3, mask, num_heads=num_heads,
            softmax_fp32=softmax_fp32, collect_colsum=collect_colsum,
            emit_probs=True, budget=budget)
        if colsum is None:
            colsum = jnp.zeros((q3.shape[0], k3.shape[1]), jnp.float32)
        return (ctx, colsum), (q3, k3, v3, mask, probs)
    out = _flash_p(q3, k3, v3, mask, num_heads, softmax_fp32, collect_colsum,
                   budget)
    return out, (q3, k3, v3, mask, None)


def _xla_equivalent(q3, k3, v3, mask, num_heads, softmax_fp32,
                    collect_colsum):
    """Same math through XLA (the recompute backward's forward)."""
    from merlot_tpu.ops.attention import _xla_attention
    b, sq, hd = q3.shape
    sk = k3.shape[1]
    d = hd // num_heads
    ctx, extra = _xla_attention(
        q3.reshape(b, sq, num_heads, d), k3.reshape(b, sk, num_heads, d),
        v3.reshape(b, sk, num_heads, d), mask,
        collect="colsum" if collect_colsum else "none",
        softmax_fp32=softmax_fp32, mask_format="multiplicative")
    if extra is None:
        extra = jnp.zeros((b, sk), jnp.float32)
    return ctx.reshape(b, sq, hd), extra


def _bwd_xla_probs(q3, k3, v3, mask, probs, g_ctx, g_colsum, *,
                   num_heads, collect_colsum):
    """Saved-probs backward, pure XLA einsums (what XLA's autodiff of the
    softmax-attention chain computes, minus any recompute):

      dV = P^T dO;  dP = dO V^T (+ g_colsum/H on the colsum path)
      dS = P * (dP - rowsum(dP * P));  dS = dS * mask * scale
      dQ = dS K;  dK = dS^T Q

    P arrives as [B, Sq, H, Sk] from the forward kernel, and every
    elementwise op on [B, H, S, S]-sized tensors stays in P's dtype (bf16
    on the training path) — upcasting them to fp32 doubles the dominant
    HBM traffic of the whole backward (measured: 207 vs 233 seg/s/chip).
    """
    b, sq, hd = q3.shape
    sk = k3.shape[1]
    d = hd // num_heads
    scale = 1.0 / (d ** 0.5)
    pt = probs.dtype
    q4 = q3.reshape(b, sq, num_heads, d)
    k4 = k3.reshape(b, sk, num_heads, d)
    v4 = v3.reshape(b, sk, num_heads, d)
    do = g_ctx.reshape(b, sq, num_heads, d)

    dv = jnp.einsum("bqhk,bqhd->bkhd", probs, do,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bqhk", do, v4,
                    preferred_element_type=pt)
    if collect_colsum:
        # colsum = mean_h sum_q P  ->  d colsum / dP = g_colsum / H
        dp = dp + (g_colsum[:, None, None, :] / num_heads).astype(pt)
    row = jnp.sum((dp * probs).astype(jnp.float32), axis=-1, keepdims=True)
    ds = probs * (dp - row.astype(pt))
    if mask is not None:
        ds = ds * mask.astype(pt)[:, :, None, :]
    ds = (ds * jnp.asarray(scale, pt)).astype(q3.dtype)
    dq = jnp.einsum("bqhk,bkhd->bqhd", ds, k4,
                    preferred_element_type=jnp.float32)
    dk = jnp.einsum("bqhk,bqhd->bkhd", ds, q4,
                    preferred_element_type=jnp.float32)
    return (dq.astype(q3.dtype).reshape(b, sq, hd),
            dk.astype(k3.dtype).reshape(b, sk, hd),
            dv.astype(v3.dtype).reshape(b, sk, hd))


def _bwd(num_heads, softmax_fp32, collect_colsum, budget, res, grads):
    q3, k3, v3, mask, probs = res
    if probs is not None:  # saved by the 'xla_probs' forward
        g_ctx, g_colsum = grads
        dq, dk, dv = _bwd_xla_probs(q3, k3, v3, mask, probs, g_ctx, g_colsum,
                                    num_heads=num_heads,
                                    collect_colsum=collect_colsum)
    elif BWD_MODE == "pallas" and bwd_kernel_fits(
            q3.shape[1], k3.shape[1], q3.shape[2], q3.dtype.itemsize,
            mask is not None):
        g_ctx, g_colsum = grads
        dq, dk, dv = _flash_bwd_pallas(q3, k3, v3, mask, g_ctx, g_colsum,
                                       num_heads=num_heads,
                                       softmax_fp32=softmax_fp32,
                                       use_gcol=collect_colsum)
    else:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_equivalent(
                q_, k_, v_, mask, num_heads, softmax_fp32, collect_colsum),
            q3, k3, v3)
        dq, dk, dv = vjp(grads)
    return dq, dk, dv, None


_flash_p.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
# attention_core-compatible entry point
# ----------------------------------------------------------------------
def flash_attention(q, k, v, mask, *, collect: str = "none",
                    softmax_fp32: bool = False,
                    budget: Optional[int] = None
                    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """q [B, Sq, H, D]; k/v [B, Sk, H, D]; mask [B, Sq, Sk] (1=attend) or
    None. Returns (ctx [B, Sq, H, D], colsum [B, Sk] f32 or None).
    ``budget`` (VMEM bytes for the q-block sizer) must match the
    caller's ``kernel_supported`` gate — e.g. DECODE_VMEM_BUDGET for
    serving decode steps."""
    assert collect in ("none", "colsum")
    b, sq, h, d = q.shape
    sk = k.shape[1]
    # [B, S, H, D] -> [B, S, H*D] is a free view (contiguous)
    ctx, colsum = _flash_p(q.reshape(b, sq, h * d), k.reshape(b, sk, h * d),
                           v.reshape(b, sk, h * d), mask,
                           h, softmax_fp32, collect == "colsum", budget)
    return (ctx.reshape(b, sq, h, d),
            colsum if collect == "colsum" else None)


def flash_attention_stacked(q, kv, mask, *, softmax_fp32: bool = False,
                            budget: Optional[int] = None) -> jnp.ndarray:
    """Forward-only attention over a STACKED KV buffer (serving decode).

    q [B, Sq, H, D]; kv [B, Sk, 2*H*D] with keys in columns [:H*D] and
    values in [H*D:] — the layout Grover's serving cache stores (one
    buffer per layer, one dynamic_update_slice per step, and the pallas
    operand IS the cache buffer: no layout boundary between the cache
    update and the kernel, which otherwise costs a full cache copy per
    layer per decode step). mask [B, Sq, Sk] (1=attend) or None.
    Returns ctx [B, Sq, H, D]. Same math/launch as flash_attention
    (_flash_fwd with v3=None); not differentiable (decode is
    forward-only)."""
    b, sq, h, d = q.shape
    ctx, _, _ = _flash_fwd(
        q.reshape(b, sq, h * d), kv, None, mask, num_heads=h,
        softmax_fp32=softmax_fp32, collect_colsum=False,
        budget=budget if budget is not None
        else (DECODE_VMEM_BUDGET if sq <= 8 else _FWD_VMEM_BUDGET))
    return ctx.reshape(b, sq, h, d)


def kernel_supported(sq: int, sk: int, d_head: int,
                     num_heads: Optional[int] = None,
                     has_mask: bool = True,
                     itemsize: int = 2,
                     budget: Optional[int] = None) -> bool:
    """Shapes the kernel handles with its VMEM budget; callers fall back to
    XLA otherwise (very long sequences, e.g. Grover decode caches).

    With num_heads given, additionally checks that even the smallest
    q-block's footprint fits the scoped-VMEM budget (the k/v blocks span
    the FULL key length, so a long-sk call can exceed VMEM at any q-block
    size — better to fall back than fail at Mosaic compile time).
    ``itemsize`` is the q/k/v element size (2 for bf16, 4 for fp32) — pass
    ``q.dtype.itemsize``. When the active BWD_MODE emits the probs tensor
    ('xla_probs'), its output block is included in the estimate too."""
    if not (sq <= MAX_KERNEL_SEQ and sk <= MAX_KERNEL_SEQ and d_head <= 128):
        return False
    if num_heads is not None:
        if budget is None:
            budget = _FWD_VMEM_BUDGET
        hd = num_heads * d_head
        emit = BWD_MODE == "xla_probs"
        q_blk = _fwd_q_block(sq, sk, hd, num_heads, itemsize, has_mask,
                             emit_probs=emit, probs_bytes=4, budget=budget)
        return _fwd_vmem_est(q_blk, sk, hd, num_heads, itemsize, has_mask,
                             emit, 4) <= budget
    return True
