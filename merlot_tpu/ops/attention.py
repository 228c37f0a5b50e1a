"""Multi-head attention core.

Matches the reference's attention semantics (reference: utils/transformer.py:33-138):
scores scaled by 1/sqrt(d_head), mask applied as ``score*mask - 1e10*(1-mask)``
(an all-masked row therefore softmaxes to uniform, same as the reference),
softmax, optional prob-dropout, then prob @ value.

TPU-first differences:
  * q/k/v stay in the natural [B, S, H, D] layout — no [0,2,1,3] transposes;
    XLA's dot_general contracts arbitrary dims directly on the MXU.
  * softmax statistics accumulate in fp32 even when activations are bf16.
  * ``collect`` controls what (if anything) is materialized besides the
    context:
      - 'none'   : nothing — lets XLA fuse freely / use the Pallas kernel.
      - 'colsum' : per-key attention mass summed over heads+queries [B, Sk]
                   (what attention-guided masking needs;
                   reference: model/modeling.py:425-437) without keeping the
                   full prob tensor alive.
      - 'probs'  : full head-meaned probs [B, Sq, Sk] (telemetry;
                   reference: transformer.py:208-211 with compress_attn).

A fused Pallas flash-attention backend handles collect='none'/'colsum' for
long sequences; the XLA path is used for short sequences where fusion wins.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

MASK_PENALTY = 1e10


def inference_backend() -> str:
    """Preferred backend for forward-only (no-grad) paths.

    The v2 pallas kernel (heads-in-kernel, natural [B,S,H*D] layout, bf16
    softmax, no external padding) beats in-model XLA attention at MERLOT's
    lengths: ViT encode 1240 -> 1530 frames/s (+23%), zero-shot story
    ordering 26 -> 46 stories/s (+77%), VCR eval 57 -> 165 ex/s (2.9x).
    The round-1 kernel lost (lane padding + fp32 softmax) and was replaced.
    On non-TPU backends (CPU tests, drivers) this falls back to XLA —
    pallas kernels only compile on TPU."""
    if jax.default_backend() in ("tpu", "axon"):
        return "pallas"
    return "xla"


def training_backend() -> str:
    """Preferred backend for TRAINING (grad) paths.

    On TPU: 'pallas' — the fused pallas forward+backward in EVERY tower.
    The backward's VMEM diet (per-head slice accumulation into the
    output blocks, no head-concat temps — pallas_attention._bwd_q_block)
    bought whole-Sq ViT q-blocks and q_blk 128 in the masked joint
    tower, flipping the one tower where XLA's saved-probs backward
    previously won: same-session tower fwd+bwd A/B (ms) vit 239.7 ->
    171.6, joint 111.0 -> 72.8, lang 29.7 -> 26.5; end-to-end pretrain
    step 254.9 -> 271.7 seg/s/chip (PERF.md round 3). This deploys the
    backward kernel that round 2 believed uncompilable: its 'compile
    helper HTTP 500' was a Mosaic scoped-vmem OOM from an unpadded
    q-block estimate, not a helper bug. Off TPU: 'auto' (XLA) — pallas
    kernels only compile on TPU."""
    if jax.default_backend() in ("tpu", "axon"):
        return "pallas"
    return "auto"


def attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mask: Optional[jnp.ndarray], *,
                   collect: str = "none",
                   dropout_rate: float = 0.0,
                   dropout_rng: Optional[jax.Array] = None,
                   backend: str = "auto",
                   softmax_fp32: bool = True,
                   mask_format: str = "multiplicative",
                   ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scaled dot-product attention.

    Args:
      q: [B, Sq, H, D]
      k, v: [B, Sk, H, D]
      mask: [B, Sq, Sk] (1 = attend) or None; bool or float.
      collect: 'none' | 'colsum' | 'probs' (see module docstring).
      backend: 'auto' | 'xla' | 'pallas'.

    Returns:
      (context [B, Sq, H, D] in q.dtype, extra) where extra is None /
      colsum [B, Sk] fp32 / probs [B, Sq, Sk] fp32 per ``collect``.
    """
    if collect not in ("none", "colsum", "probs"):
        raise ValueError(f"bad collect={collect}")

    fusable = collect != "probs" and dropout_rate == 0.0
    if backend == "auto":
        # 'auto' = XLA. Call sites pick per path: training uses
        # training_backend() -> 'pallas' (fused fwd+bwd kernel in every
        # tower since the backward's VMEM diet — 254.9 -> 271.7
        # seg/s/chip, PERF.md round 3); inference drivers use
        # inference_backend() -> 'pallas' everywhere (ViT encode +23%,
        # zero-shot +77%, VCR eval 2.9x).
        backend = "xla"

    if backend == "pallas" and fusable:
        from merlot_tpu.ops.pallas_attention import (flash_attention,
                                                     kernel_supported)
        if kernel_supported(q.shape[1], k.shape[1], q.shape[-1],
                            num_heads=q.shape[2], has_mask=mask is not None,
                            itemsize=q.dtype.itemsize):
            assert mask_format == "multiplicative"
            return flash_attention(q, k, v, mask, collect=collect,
                                   softmax_fp32=softmax_fp32)
        # sequence too long for the kernel's VMEM budget -> XLA below

    return _xla_attention(q, k, v, mask, collect=collect,
                          dropout_rate=dropout_rate, dropout_rng=dropout_rng,
                          softmax_fp32=softmax_fp32, mask_format=mask_format)


# Layout for the XLA attention einsums (read once at import, like the
# BENCH_* knobs):
#   natural — q/k/v stay [B, S, H, D]; XLA picks operand layouts per einsum
#             (profiling shows it inserts ~2 ms/layer of [B,S,H,D]->[B,H,S,D]
#             copies in the BACKWARD of each einsum at ViT shapes)
#   bhsd    — transpose q/k/v ONCE to [B, H, S, D] and run every einsum in
#             batched-matmul form; 4 explicit transposes replace the many
#             XLA-inserted ones (measured a wash end-to-end on v5e, PERF.md)
_BHSD = os.environ.get("MERLOT_XLA_ATTN_BHSD", "0") == "1"


def _xla_attention(q, k, v, mask, *, collect, dropout_rate=0.0,
                   dropout_rng=None, softmax_fp32=True,
                   mask_format="multiplicative"):
    d_head = q.shape[-1]
    scale = 1.0 / (d_head ** 0.5)
    # softmax_fp32=False keeps scores/probs in the compute dtype (bf16) —
    # the reference's exact behaviour (TF softmaxes its bf16 scores in
    # bf16), halving the [B,H,S,S] HBM traffic; fp32 is the safer default
    sm_dtype = jnp.float32 if softmax_fp32 else q.dtype

    if _BHSD:
        qt = jnp.transpose(q, (0, 2, 1, 3))
        kt = jnp.transpose(k, (0, 2, 1, 3))
        vt = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                            preferred_element_type=sm_dtype) * scale
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=sm_dtype) * scale

    if mask is not None and mask_format == "bias":
        # mask IS a precomputed additive bias (0 attend / -1e10 blocked);
        # same softmax as the multiply form except on fully-masked rows,
        # whose outputs nothing consumes. Saves a [B,H,S,S] multiply.
        scores = scores + mask.astype(sm_dtype)[:, None]
    elif mask is not None:
        m = mask.astype(sm_dtype)[:, None]  # broadcast over heads
        scores = scores * m - jnp.asarray(MASK_PENALTY, sm_dtype) * (1 - m)

    probs = jax.nn.softmax(scores, axis=-1)
    # named for remat policies: 'probs'/'probs_dots' save THIS tensor so
    # the backward skips the scores+softmax recompute (nn/transformer.py
    # _remat_policy); a no-op unless such a policy is active
    probs = _checkpoint_name(probs, "attn_probs")

    extra = None
    if collect == "colsum":
        # head-MEANED then query-summed, matching the reference's
        # compress_attn + reduce_sum([layers, queries]) pipeline
        # (transformer.py:208-211, modeling.py:428)
        extra = (jnp.sum(probs.astype(jnp.float32), axis=(1, 2))
                 / probs.shape[1])  # [B, Sk]
    elif collect == "probs":
        extra = jnp.mean(probs.astype(jnp.float32), axis=1)  # [B, Sq, Sk]

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    if _BHSD:
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), vt,
                         preferred_element_type=jnp.float32)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3))
    else:
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                         preferred_element_type=jnp.float32)
    return ctx.astype(q.dtype), extra
