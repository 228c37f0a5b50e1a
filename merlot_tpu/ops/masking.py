"""Attention-guided SpanBERT masking (pure function, explicit PRNG).

Parity target: MerlotModel.mask_inputs (reference: model/modeling.py:381-489).

Pipeline per example row of length L:
  1. tokens in the top ``topk_perc`` of attention-received mass get sampling
     weight ``topk_val`` vs ``nontopk_val`` elsewhere, calibrated so a single
     draw lands in the top set with prob ``choose_topk_prob``;
  2. ``num_to_mask = int(L * masking_rate)`` anchor positions are drawn
     without replacement via Gumbel top-k over log-weights (special tokens,
     id < 100, get -1e8);
  3. each anchor is extended to a span by two categorical draws over
     ``spanbert_len_probs`` (down and up);
  4. span membership is resolved back to exactly ``num_to_mask`` positions by
     ranking (first-covering-span index, tie-broken by sampling weight) —
     the reference's trick for keeping a static masked count on TPU;
  5. masked positions become 80% MASK / 10% random non-special token /
     10% kept.

Returns (masked_ids [B, L], masked_idx [B, num_to_mask] sorted ascending).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from merlot_tpu.core.tokenizer import MASK, SPECIAL_TOKEN_CUTOFF
from merlot_tpu.ops.sampling import gumbel_topk_without_replacement


def attention_guided_span_mask(
    rng: jax.Array,
    input_ids: jnp.ndarray,           # [B, L] int32
    attn_mass: Optional[jnp.ndarray],  # [B, L] fp32 attention received, or None
    *,
    vocab_size: int,
    masking_rate: float = 0.2,
    topk_perc: float = 0.20,
    choose_topk_prob: float = 0.5,
    do_spanbert: bool = True,
    spanbert_len_probs: Sequence[float] = (0.625, 0.25, 0.125),
    use_attn: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, L = input_ids.shape
    num_topk = int(L * topk_perc)
    num_to_mask = int(L * masking_rate)
    k_anchor, k_lo, k_hi, k_opt, k_rand = jax.random.split(rng, 5)

    is_special = (input_ids < SPECIAL_TOKEN_CUTOFF).astype(jnp.float32)
    positions = jnp.arange(L, dtype=jnp.int32)

    # -- step 1: per-token sampling weights ---------------------------------
    nontopk_val = 0.01
    topk_val = (nontopk_val * choose_topk_prob * (1.0 - topk_perc)
                / (topk_perc * (1.0 - choose_topk_prob)))

    if use_attn and attn_mass is not None:
        mass = attn_mass.astype(jnp.float32) * (1.0 - is_special)
        _, top_inds = jax.lax.top_k(mass, num_topk)          # [B, num_topk]
        is_important = jnp.any(top_inds[..., None] == positions[None, None], axis=1)
        mask_weight = is_important.astype(jnp.float32) * (topk_val - nontopk_val) + nontopk_val
    else:
        mask_weight = jnp.ones((B, L), jnp.float32)

    # -- step 2: anchors via Gumbel top-k without replacement ---------------
    log_mask = jnp.log(mask_weight) - 1e8 * is_special
    # reversed so that spans anchored on higher-weight draws win ties later
    idx = gumbel_topk_without_replacement(k_anchor, log_mask, num_to_mask)[:, ::-1]

    if do_spanbert:
        len_logp = jnp.log(jnp.asarray(spanbert_len_probs, jnp.float32))
        lo = jax.random.categorical(k_lo, len_logp, shape=(B, num_to_mask)).astype(jnp.int32)
        hi = jax.random.categorical(k_hi, len_logp, shape=(B, num_to_mask)).astype(jnp.int32)
        span_start = idx - lo
        span_end = idx + hi

        # [B, num_to_mask, L]: does span m cover position l?
        covers = ((positions[None, None] >= span_start[..., None])
                  & (positions[None, None] <= span_end[..., None]))
        # index of the first covering span (0 if none — never actually chosen
        # because the tie-break puts uncovered positions below covered ones)
        which = jnp.argmax(covers.astype(jnp.float32), axis=1).astype(jnp.float32)
        which = which * (1.0 - is_special)
        which = which + 0.5 * mask_weight / jnp.max(mask_weight)
        _, mask_idx = jax.lax.top_k(which, num_to_mask)
    else:
        mask_idx = idx

    mask_idx = jnp.sort(mask_idx, axis=1).astype(jnp.int32)

    # -- step 5: 80/10/10 corruption ----------------------------------------
    flat_ids = input_ids.reshape(-1)
    option_logp = jnp.log(jnp.asarray([0.1, 0.8, 0.1], jnp.float32))
    option = jax.random.categorical(k_opt, option_logp, shape=(B * L,)).astype(jnp.int32)
    do_mask = jnp.any(mask_idx[..., None] == positions[None, None], axis=1).reshape(-1)
    option = option * do_mask.astype(jnp.int32)

    random_ids = jax.random.randint(k_rand, (B * L,), SPECIAL_TOKEN_CUTOFF, vocab_size,
                                    dtype=jnp.int32)
    options = jnp.stack([flat_ids, jnp.full_like(flat_ids, MASK), random_ids], axis=1)
    masked_flat = jnp.take_along_axis(options, option[:, None], axis=1)[:, 0]
    return masked_flat.reshape(B, L), mask_idx
