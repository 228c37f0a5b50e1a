"""Grover: the decoder-only LM used by the ASR denoiser, TPU-native.

Parity target: data/groverdenoise/lm/modeling.py (reference). Architecture
(GPT-2-family, but note the reference's idiosyncratic residual layout, which
we reproduce exactly):

  per layer:  h = LN( (h + attn(h)) + mlp(LN(h + attn(h))) )
  i.e. attention reads the UN-normalized stream (:495-510), and
  residual_mlp_layer applies 'mlp_ln0' before the MLP and 'mlp_ln1' after
  the residual add (:230-258). Embeddings are word+position with an
  'embed_norm' LN (:262-331). Logits are tied to the embedding table, no
  bias (:530-533). Weighted LM loss with a x4 bonus on denoise-target tokens
  (:535-565).

TPU-native sampling (replaces :694-904):
  * the reference grows its KV cache by tf.concat every step inside
    tf.while_loop — a new allocation per token. Here the cache is
    PREALLOCATED at [num_layers, B, max_len, heads, d_head] and written with
    dynamic_update_slice; the decode loop is a lax.while_loop over static
    shapes, so XLA compiles one step and reuses buffers.
  * top-p keeps the reference's exact semantics (sort descending, keep
    cumulative < p plus the argmax, sample in sorted space: :331-386);
    top-k likewise (:389-421).
  * ``sample_seq2seq`` force-feeds non-pad tokens of a partial context
    (the denoising interface, :813-904): at each position the sampled token
    is overridden by the context token when one exists.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from merlot_tpu.nn.layers import DenseTN, LayerNorm
from merlot_tpu.ops import pallas_attention
from merlot_tpu.ops.activations import gelu

# Serving attention backend for cached (decode/prefill) forwards:
#   'auto'   — the fused pallas kernel on TPU when the shape fits its VMEM
#              budget, else the XLA einsum path
#   'xla'    — always the einsum path
#   'pallas' — force the kernel (interpret-mode tests)
# The kernel replaces the scores/mask/softmax/context chain (4+ XLA
# fusions per layer per decode step) with one op; math is identical
# (fp32 scores+softmax, multiply-form mask, same 1/sqrt(d) scale).
# Training forwards (cache=None) always use XLA: the fused backward
# cannot compile in this environment (see ops/pallas_attention.BWD_MODE).
DECODE_ATTN = "auto"


@dataclass(frozen=True)
class GroverConfig:
    vocab_size: int = 50270
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    initializer_range: float = 0.02
    pad_token_id: int = 0
    use_bfloat16: bool = False
    # Serving-only: one [H, 3H] qkv projection per layer instead of three
    # [H, H] matmuls (fewer ops per decode step; same bytes read). Param
    # trees from standard training convert via ``fuse_qkv_for_serving``.
    fused_qkv: bool = False
    # Serving-only: store each layer's KV cache as ONE [B, max_len, 2H]
    # buffer (keys in columns [:H], values in [H:]) instead of two
    # [B, max_len, n_h, d] buffers. With fused_qkv the new chunk is a
    # contiguous column slice of the qkv matmul output (one
    # dynamic_update_slice, zero reshapes/concats per layer per step),
    # and the cached-attention pallas kernel reads the buffer directly
    # (flash_attention_stacked) — no k/v split, no layout copy between
    # the cache write and the kernel. Cache layout only; params unchanged.
    stacked_kv: bool = False

    @classmethod
    def from_json_file(cls, path: str) -> "GroverConfig":
        with open(path) as f:
            d = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @property
    def d_head(self) -> int:
        return self.hidden_size // self.num_attention_heads


class GroverLayer(nn.Module):
    cfg: GroverConfig

    @nn.compact
    def __call__(self, h, mask, kv_write_pos=None, cache_k=None, cache_v=None,
                 cache_kv=None, deterministic=True):
        """One decoder layer.

        h [B, S, H]; mask [B or 1, S, K] over the key axis (the preallocated
        cache when decoding, else S). If cache_k/v given ([B, max_len, n_h,
        d]), the new K/V chunk is written at kv_write_pos and attention runs
        over the whole buffer. cache_kv is the stacked alternative (one
        [B, max_len, 2H] buffer, keys in [:H], values in [H:] — see
        GroverConfig.stacked_kv). Returns (h, new_cache_k, new_cache_v,
        new_cache_kv).
        """
        c = self.cfg
        dtype = jnp.bfloat16 if c.use_bfloat16 else jnp.float32
        b, s, _ = h.shape
        hs = c.hidden_size

        def heads(y):
            return y.reshape(b, s, c.num_attention_heads, c.d_head)

        if c.fused_qkv:
            qkv = DenseTN(3 * hs, dtype=dtype,
                          initializer_range=c.initializer_range,
                          name="qkv")(h)
            q = heads(qkv[..., :hs])
            # [B, S, 2H] k‖v columns — for the stacked cache this slice is
            # written verbatim (contiguous, no reshape/concat)
            kv_flat = qkv[..., hs:]
            k_flat, v_flat = kv_flat[..., :hs], kv_flat[..., hs:]
        else:
            def proj(name, x):
                return DenseTN(hs, dtype=dtype,
                               initializer_range=c.initializer_range,
                               name=name)(x)

            q = heads(proj("query", h))
            k_flat = proj("key", h)
            v_flat = proj("value", h)
            kv_flat = None

        if cache_kv is not None:
            if kv_flat is None:
                kv_flat = jnp.concatenate([k_flat, v_flat], axis=-1)
            cache_kv = jax.lax.dynamic_update_slice(
                cache_kv, kv_flat.astype(cache_kv.dtype),
                (0, kv_write_pos, 0))
            k_len = cache_kv.shape[1]
        elif cache_k is not None:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, heads(k_flat).astype(cache_k.dtype),
                (0, kv_write_pos, 0, 0))
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, heads(v_flat).astype(cache_v.dtype),
                (0, kv_write_pos, 0, 0))
            k_len = cache_k.shape[1]
        else:
            k_len = s

        cached = cache_kv is not None or cache_k is not None
        # decode steps (s<=8: tiny q/o/mask blocks, footprint is the
        # full-cache block) get the raised DECODE_VMEM_BUDGET so long
        # serving contexts (e.g. the denoise server's 1537) keep the
        # fused kernel instead of silently falling back to the einsums
        use_kernel = (cached and DECODE_ATTN != "xla"
                      and (DECODE_ATTN == "pallas"
                           # 'axon' is this image's remote-TPU platform
                           # name (same hardware; see attention.py)
                           or (jax.default_backend() in ("tpu", "axon")
                               and pallas_attention.kernel_supported(
                                   s, k_len, c.d_head,
                                   c.num_attention_heads, True,
                                   jnp.dtype(q.dtype).itemsize,
                                   budget=(
                                       pallas_attention.DECODE_VMEM_BUDGET
                                       if s <= 8 else None)))))
        if use_kernel:
            # cached serving forward: one fused kernel for scores + mask +
            # fp32 softmax + context — same math as the einsum path below
            # (flash_attention applies the 1/sqrt(d) scale and the
            # multiply-form mask internally)
            m3 = jnp.broadcast_to(mask, (b, s, k_len))
            # the q-block sizer must work against the SAME budget the
            # kernel_supported gate above approved, or the launched
            # kernel's footprint can exceed what the gate checked
            kbudget = (pallas_attention.DECODE_VMEM_BUDGET if s <= 8
                       else None)
            if cache_kv is not None:
                # the kernel operand IS the cache buffer (same dtype by
                # construction: empty_cache allocates in the model dtype)
                ctx = pallas_attention.flash_attention_stacked(
                    q, cache_kv, m3, softmax_fp32=True, budget=kbudget)
            else:
                ctx, _ = pallas_attention.flash_attention(
                    q, cache_k.astype(q.dtype), cache_v.astype(q.dtype), m3,
                    softmax_fp32=True, budget=kbudget)
            ctx = ctx.astype(q.dtype)
        else:
            if cache_kv is not None:
                k_all = cache_kv[..., :hs].reshape(
                    b, k_len, c.num_attention_heads, c.d_head)
                v_all = cache_kv[..., hs:].reshape(
                    b, k_len, c.num_attention_heads, c.d_head)
            elif cache_k is not None:
                k_all, v_all = cache_k, cache_v
            else:
                k_all, v_all = heads(k_flat), heads(v_flat)
            scale = 1.0 / (c.d_head ** 0.5)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_all.astype(q.dtype),
                                preferred_element_type=jnp.float32) * scale
            m = mask.astype(jnp.float32)[:, None] if mask.ndim == 3 else mask
            scores = scores * m - 1e10 * (1.0 - m)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype),
                             v_all.astype(q.dtype),
                             preferred_element_type=jnp.float32).astype(q.dtype)

        attn_out = DenseTN(c.hidden_size, dtype=dtype,
                           initializer_range=c.initializer_range,
                           name="out_proj")(ctx.reshape(b, s, c.hidden_size))
        attn_out = nn.Dropout(c.hidden_dropout_prob)(attn_out,
                                                     deterministic=deterministic)

        x = h + attn_out
        x_norm = LayerNorm(name="mlp_ln0")(x)
        mlp = DenseTN(c.intermediate_size, dtype=dtype,
                      initializer_range=c.initializer_range,
                      name="intermediate")(x_norm)
        mlp = DenseTN(c.hidden_size, dtype=dtype,
                      initializer_range=c.initializer_range,
                      name="output")(gelu(mlp))
        mlp = nn.Dropout(c.hidden_dropout_prob)(mlp, deterministic=deterministic)
        out = LayerNorm(name="mlp_ln1")(x + mlp)
        return out, cache_k, cache_v, cache_kv


class GroverLM(nn.Module):
    cfg: GroverConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, *,
                 cache: Optional[Dict[str, jnp.ndarray]] = None,
                 position_offset=0,
                 deterministic: bool = True,
                 return_hidden: bool = False,
                 compute_logits: bool = True):
        """Forward. Training: cache=None, causal within the sequence.
        Decoding: cache = {'k00','v00','k01',...} per-layer [B, max_len,
        n_h, d] buffers — or, with cfg.stacked_kv, {'kv00','kv01',...}
        [B, max_len, 2H] stacked buffers (see ``empty_cache``); the current
        chunk is written at position_offset and attention covers cache
        positions < position_offset + S.

        The cache is per-layer dict entries, NOT one stacked [L, ...]
        array: a stacked cache forces a dynamic-slice copy of the layer's
        buffer on read plus a full-cache jnp.stack copy per decode step —
        profiled at ~10 ms/step (~2 GB of pure copies) for grover-medium at
        batch 8. Flat entries are aliased in place across lax.while_loop
        iterations (tiny [B, 1, n_h, d] writes, zero-copy reads).

        Returns (logits [B, S, vocab], new_cache | None); with
        return_hidden, (logits, new_cache, hidden [B, S, H]) — for
        classification pooling (see ``pooled_hidden``).
        """
        c = self.cfg
        b, s = input_ids.shape

        table = self.param("word_embed",
                           nn.initializers.truncated_normal(c.initializer_range,
                                                            lower=-2.0, upper=2.0),
                           (c.vocab_size, c.hidden_size), jnp.float32)
        pos_table = self.param("pos_embed",
                               nn.initializers.truncated_normal(
                                   c.initializer_range, lower=-2.0, upper=2.0),
                               (c.max_position_embeddings, c.hidden_size),
                               jnp.float32)
        h = jnp.take(table, input_ids, axis=0)
        pos = jax.lax.dynamic_slice_in_dim(
            pos_table, position_offset, s, axis=0) if not isinstance(
            position_offset, int) or position_offset else pos_table[:s]
        h = LayerNorm(name="embed_norm")(h + pos[None])

        q_pos = position_offset + jnp.arange(s)
        if cache is not None:
            max_len = next(iter(cache.values())).shape[1]
            k_pos = jnp.arange(max_len)
            mask = (k_pos[None] <= q_pos[:, None]).astype(jnp.float32)[None]
        else:
            mask = (jnp.arange(s)[None] <= q_pos[:, None]
                    ).astype(jnp.float32)[None]

        new_cache = {} if cache is not None else None
        for i in range(c.num_hidden_layers):
            if c.stacked_kv:
                ckv = cache[f"kv{i:02d}"] if cache is not None else None
                ck = cv = None
            else:
                ck = cache[f"k{i:02d}"] if cache is not None else None
                cv = cache[f"v{i:02d}"] if cache is not None else None
                ckv = None
            h, ck, cv, ckv = GroverLayer(c, name=f"layer{i:02d}")(
                h, mask, kv_write_pos=position_offset, cache_k=ck, cache_v=cv,
                cache_kv=ckv, deterministic=deterministic)
            if cache is not None:
                if c.stacked_kv:
                    new_cache[f"kv{i:02d}"] = ckv
                else:
                    new_cache[f"k{i:02d}"] = ck
                    new_cache[f"v{i:02d}"] = cv

        if not compute_logits:
            # long-prefix prefill computes logits OUTSIDE in position
            # chunks (lm_logits_for_hidden): the full [B, S, V] fp32 tensor
            # is 6 GB at batch 32 x 1024 x 50270 and only per-position
            # target probabilities are ever consumed
            logits = None
        else:
            # one shared head implementation — chunked prefill callers
            # must use EXACTLY this math (see lm_logits_for_hidden)
            logits = lm_logits_for_hidden(
                {"params": {"word_embed": table}}, c, h)
        if return_hidden:
            return logits, new_cache, h
        return logits, new_cache

    # ------------------------------------------------------------------
    def empty_cache(self, batch_size: int, max_len: int) -> Dict[str, jnp.ndarray]:
        """Per-layer KV buffers: {'k00','v00',...} [B, max_len, n_h, d], or
        with cfg.stacked_kv {'kv00',...} [B, max_len, 2H] (keys ‖ values).
        Flat entries alias in place across decode steps — see __call__."""
        c = self.cfg
        dtype = jnp.bfloat16 if c.use_bfloat16 else jnp.float32
        out: Dict[str, jnp.ndarray] = {}
        if c.stacked_kv:
            shape = (batch_size, max_len, 2 * c.hidden_size)
            for i in range(c.num_hidden_layers):
                out[f"kv{i:02d}"] = jnp.zeros(shape, dtype)
        else:
            shape = (batch_size, max_len, c.num_attention_heads, c.d_head)
            for i in range(c.num_hidden_layers):
                out[f"k{i:02d}"] = jnp.zeros(shape, dtype)
                out[f"v{i:02d}"] = jnp.zeros(shape, dtype)
        return out


def pooled_hidden(hidden: jnp.ndarray, input_ids: jnp.ndarray,
                  clf_token: int) -> jnp.ndarray:
    """Hidden state at the first occurrence of clf_token per row
    (classification pooling; reference: lm/modeling.py:567-574)."""
    pool_idx = jnp.argmax((input_ids == clf_token).astype(jnp.float32), axis=1)
    return jnp.take_along_axis(hidden, pool_idx[:, None, None].astype(jnp.int32)
                               .repeat(hidden.shape[-1], -1), axis=1)[:, 0]


def grover_lm_loss(logits: jnp.ndarray, input_ids: jnp.ndarray,
                   is_target: jnp.ndarray, pad_token_id: int = 0,
                   target_bonus: float = 4.0):
    """Weighted next-token CE (reference: :535-565). logits/[B,S,V] align
    with input_ids; targets are input_ids shifted left, pad-filled."""
    b, s = input_ids.shape
    targets = jnp.concatenate(
        [input_ids[:, 1:], jnp.full((b, 1), pad_token_id, input_ids.dtype)], 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_tok = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]

    w = (targets != pad_token_id).astype(jnp.float32)
    w = w + is_target.astype(jnp.float32) * target_bonus
    denom = jnp.sum(w) + 1e-5
    is_t = is_target.astype(jnp.float32)
    loss = jnp.sum(w * per_tok) / denom
    ctx_loss = jnp.sum((1 - is_t) * w * per_tok) / denom
    trg_loss = jnp.sum(is_t * w * per_tok) / denom
    return loss, {"loss": loss, "ctx_loss": ctx_loss, "trg_loss": trg_loss}


# ----------------------------------------------------------------------
# sampling
# ----------------------------------------------------------------------
def _top_p_full_sort(key: jax.Array, logits: jnp.ndarray,
                     p: float) -> jnp.ndarray:
    """The reference's literal algorithm: full-vocab sort (reference:
    :331-386). O(V log V) per row — the prefiltered path below is
    distribution-identical and ~10x cheaper at V=50k."""
    probs = jax.nn.softmax(logits, axis=-1)
    order = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    # reference cumsum is INCLUSIVE then tests `< p`, keeping rank 0 always
    csum = jnp.cumsum(sorted_probs, axis=-1)
    vocab = logits.shape[-1]
    keep = (csum < p) | (jnp.arange(vocab)[None] < 1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    sorted_logits = sorted_logits - (~keep).astype(jnp.float32) * 1e10
    pick = jax.random.categorical(key, sorted_logits)
    return jnp.take_along_axis(order, pick[:, None], axis=-1)[:, 0].astype(jnp.int32)


def top_p_sample(key: jax.Array, logits: jnp.ndarray, p: float,
                 ignore_ids: Optional[jnp.ndarray] = None,
                 k_prefilter: int = 128) -> jnp.ndarray:
    """Nucleus sampling with the reference's keep rule (reference: :331-386):
    keep tokens whose cumulative mass (inclusive) is < p, always keep the
    argmax, sample in sorted space. logits [B, V] -> [B] int32.

    The reference sorts the FULL vocab per step; that sort is the per-row
    serving bottleneck (it does not batch — measured ~3 ms/row at V=50270 on
    v5e, dominating the decode step). With ``k_prefilter`` > 0 the sort is
    replaced by ``lax.top_k(k_prefilter)`` + a full-vocab logsumexp for the
    exact softmax denominator. The kept set is provably identical whenever
    the nucleus fits inside the top-k (the k-th inclusive cumsum >= p
    implies every rank beyond k is excluded by the keep rule).
    ``k_prefilter=0`` forces the literal full-sort path.

    Fallback is STAGED and PER-ROW (ADVICE r3 item 3 closed): when some
    row's nucleus is wider than ``k_prefilter``, successively wider
    ``lax.top_k`` stages run (x8 per stage, up to three stages — still far
    cheaper than the per-row full-vocab sort, which does not batch), and
    only if some row's nucleus exceeds the LAST stage does the full sort
    run — with ``jnp.where`` selecting, per row, the sample from the
    cheapest stage whose top-k provably contains the row's nucleus. Every
    stage samples the exact reference distribution for the rows it serves
    (exact full-vocab softmax via the logsumexp denominator), so per-row
    marginals always match the reference exactly; ladder stages i>=1 draw
    from independent folds of ``key`` so mixed-stage batches stay
    independent across rows — with ONE pinned exception: when the full
    sort is the IMMEDIATE fallback after stage 0 (k_prefilter*8 >= vocab,
    so no intermediate stage exists), it reuses the raw key so its output
    bit-matches ``_top_p_full_sort(key)``
    (test_top_p_prefilter_matches_full_sort's contract); in that one
    configuration, rows served by stage 0 and rows served by the full
    sort share underlying random bits — per-row marginals are still
    exact. The all-rows-fit fast path is unchanged (one lax.cond,
    nothing else computed). At the default k=128 the ladder is
    128 -> 1024 -> 8192 -> full sort (the default moved 1024 -> 128 after
    the round-4 decode profile showed lax.top_k(1024) was ~8% of the b8
    decode step; PERF.md). The remaining (deliberate) cliff: a row whose
    nucleus exceeds the last ladder stage (e.g. near-uniform logits at
    p=0.94, which needs ~47k of V=50270 tokens) still triggers the full
    sort for the batch — that regime indicates a broken model, not a
    sampler target; benches with random weights must force small p
    (tools/bench_grover_decode.py)."""
    if ignore_ids is not None:
        logits = logits - ignore_ids.astype(jnp.float32)[None] * 1e10
    if p > 0.999999:
        return jax.random.categorical(key, logits).astype(jnp.int32)

    vocab = logits.shape[-1]
    if not k_prefilter or k_prefilter >= vocab:
        return _top_p_full_sort(key, logits, p)

    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)

    def stage(k: int, stage_key):
        """(fits [B] bool, sample [B] int32) from the top-k kept set."""
        top_logits, top_idx = jax.lax.top_k(logits, k)  # sorted descending
        sorted_probs = jnp.exp(top_logits - lse)  # exact full-vocab probs
        csum = jnp.cumsum(sorted_probs, axis=-1)
        keep = (csum < p) | (jnp.arange(k)[None] < 1)
        masked = top_logits - (~keep).astype(jnp.float32) * 1e10
        pick = jax.random.categorical(stage_key, masked)
        sample = jnp.take_along_axis(
            top_idx, pick[:, None], axis=-1)[:, 0].astype(jnp.int32)
        return csum[:, -1] >= p, sample

    ladder = [k_prefilter]
    while len(ladder) < 3 and ladder[-1] * 8 < vocab:
        ladder.append(ladder[-1] * 8)

    def tail(i: int, fits, best, key):
        """Sample for every row, escalating rows ``fits`` hasn't served.
        Built as nested lax.conds so a stage's sort only executes when
        some row actually needs it. Stage i>=1 draws from fold_in(key, i)
        — rows served by different stages must not share underlying
        random bits (same-key categoricals of different widths overlap
        counters across rows)."""
        if i == len(ladder):
            # when the full sort is the IMMEDIATE fallback (no intermediate
            # stage fits under the vocab), it draws from the raw key so it
            # bit-matches _top_p_full_sort(key) — the documented contract
            # tests pin (test_top_p_prefilter_matches_full_sort)
            fs_key = key if i == 1 else jax.random.fold_in(key, i)
            return jnp.where(fits, best,
                             _top_p_full_sort(fs_key, logits, p))

        def slow(key):
            f_i, s_i = stage(ladder[i], jax.random.fold_in(key, i))
            return tail(i + 1, fits | f_i, jnp.where(fits, best, s_i), key)

        return jax.lax.cond(jnp.all(fits), lambda key: best, slow, key)

    fits1, s1 = stage(ladder[0], key)
    return tail(1, fits1, s1, key)


def top_k_sample(key: jax.Array, logits: jnp.ndarray, k: int,
                 ignore_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Top-k sampling (reference: :389-421). ``lax.top_k`` replaces the
    reference's full-vocab sort — identical kept set and renormalized
    distribution, O(V·k) instead of O(V log V)."""
    if ignore_ids is not None:
        logits = logits - ignore_ids.astype(jnp.float32)[None] * 1e10
    top_logits, top_idx = jax.lax.top_k(logits, k)
    pick = jax.random.categorical(key, top_logits)
    return jnp.take_along_axis(
        top_idx, pick[:, None], axis=-1)[:, 0].astype(jnp.int32)


def lm_logits_for_hidden(variables, cfg: GroverConfig,
                         h: jnp.ndarray) -> jnp.ndarray:
    """Tied-embedding logits for hidden states — THE in-model head
    (GroverLM.__call__ delegates here): bf16 operands + fp32 accumulate
    when cfg.use_bfloat16, matching the reference's bfloat16-getter
    semantics (lm/modeling.py:528-533 under the custom getter of
    utils.py: the fp32 master table is cast to bf16 at use) and keeping
    XLA from materializing an fp32 table copy inside the decode loop.
    NOTE: this applies to ALL use_bfloat16=True forwards — training and
    eval included, not just serving. That IS the reference contract, but
    it differs from a hypothetical fp32-table head by one bf16 rounding
    of the table operand; test_grover.py::test_bf16_head_delta quantifies
    the logits delta. Exposed so callers can compute long-prefix logits
    in position chunks instead of materializing the full [B, S, V]
    tensor."""
    table = variables["params"]["word_embed"]
    if cfg.use_bfloat16:
        return jnp.dot(h, table.astype(h.dtype).T,
                       preferred_element_type=jnp.float32)
    return jnp.dot(h.astype(jnp.float32), table.T,
                   preferred_element_type=jnp.float32)


def stack_grover_params(variables, n_stage: int):
    """Standard GroverLM param tree -> pipeline (PP) form: the uniform
    ``layer{i:02d}`` subtrees become ONE ``stages`` subtree with leaves
    [n_stage, L/n_stage, ...] (dim 0 = pipeline stage), everything else
    (embeddings, embed_norm) unchanged. Do this ONCE outside the train
    step — re-stacking inside a jitted loss would copy the full layer
    stack (and reshard it) every step."""
    from merlot_tpu.parallel.pipeline import stack_stage_params
    p = dict(variables["params"])
    layers = [p.pop(k) for k in sorted(p) if k.startswith("layer")]
    p["stages"] = stack_stage_params(layers, n_stage)
    return {**variables, "params": p}


def unstack_grover_params(pp_variables, num_layers: int):
    """Inverse of ``stack_grover_params`` (PP checkpoint -> standard)."""
    p = dict(pp_variables["params"])
    stages = p.pop("stages")
    flat = jax.tree.map(
        lambda x: x.reshape((num_layers,) + x.shape[2:]), stages)
    for i in range(num_layers):
        p[f"layer{i:02d}"] = jax.tree.map(lambda x: x[i], flat)
    return {**pp_variables, "params": p}


def shard_grover_pp_params(pp_variables, mesh, axis: str = "stage"):
    """Place a PP-form tree: ``stages`` one stage per device along
    ``axis``, everything else replicated."""
    from merlot_tpu.parallel.pipeline import shard_stage_params
    from jax.sharding import NamedSharding, PartitionSpec
    p = dict(pp_variables["params"])
    p["stages"] = shard_stage_params(p["stages"], mesh, axis)
    rep = NamedSharding(mesh, PartitionSpec())
    for k in p:
        if k != "stages":
            p[k] = jax.tree.map(lambda x: jax.device_put(x, rep), p[k])
    return {**pp_variables, "params": p}


def grover_pipeline_forward(pp_variables, cfg: GroverConfig,
                            input_ids: jnp.ndarray, *, mesh,
                            num_microbatches: int,
                            axis: str = "stage",
                            dropout_rng: Optional[jax.Array] = None,
                            data_axis: Optional[str] = None
                            ) -> jnp.ndarray:
    """Training forward with the 24-layer stack PIPELINE-parallel over a
    ``stage`` mesh axis (parallel/pipeline.py GPipe schedule) — the scale
    axis for decoder LMs that outgrow DP+TP memory. Takes the PP-form
    tree from ``stack_grover_params`` (place it with
    ``shard_grover_pp_params``): each device holds ONE stage's layers
    plus the replicated embeddings/head (~1/6 of grover-medium).
    Microbatches stream through ppermute hops; jax.grad through this
    function yields the reverse pipeline, so it drops into the standard
    train step.

    Math is identical to ``GroverLM.apply`` at cache=None (same modules,
    same order); tests assert logits equality. Returns [B, S, vocab]
    fp32 logits.
    """
    from merlot_tpu.parallel.pipeline import microbatch, pipeline_apply
    p = pp_variables["params"]
    c = cfg
    b, s = input_ids.shape
    h = jnp.take(p["word_embed"], input_ids, axis=0)
    h = LayerNorm(name="embed_norm").apply(
        {"params": p["embed_norm"]}, h + p["pos_embed"][:s][None])
    mask = (jnp.arange(s)[None] <= jnp.arange(s)[:, None]
            ).astype(jnp.float32)[None]

    layer = GroverLayer(c)

    if dropout_rng is None:
        def layer_fn(lp, hh):
            return layer.apply({"params": lp}, hh, mask)[0]
    else:
        # per-(layer, microbatch) keys threaded by the schedule
        def layer_fn(lp, hh, key):
            return layer.apply({"params": lp}, hh, mask,
                               deterministic=False,
                               rngs={"dropout": key})[0]

    h_mb = microbatch(h, num_microbatches)
    out = pipeline_apply(layer_fn, p["stages"], h_mb, mesh=mesh, axis=axis,
                         rng=dropout_rng, data_axis=data_axis)
    out = out.reshape(b, s, c.hidden_size)
    return lm_logits_for_hidden(pp_variables, c, out)


def cast_params_for_serving(variables):
    """Serving fast path: store matrices/embeddings in bf16 on device.

    Decode at batch<=8 is HBM-bandwidth-bound (every step reads every
    weight); halving the stored bytes ~halves the step time. Norm scales
    and biases (1-D) stay fp32 — LayerNorm statistics are computed in fp32
    regardless (ops/norms.py), so this only changes matmul operand
    precision, the same contract training uses (fp32 master weights, bf16
    compute). Use with ``GroverConfig(use_bfloat16=True)`` so activations
    and the KV cache are bf16 too."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if (hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2)
        else x, variables)


def fuse_qkv_for_serving(variables):
    """Rewrite a standard (three-projection) param tree for a
    ``GroverConfig(fused_qkv=True)`` model: per layer, concatenate the
    query/key/value kernels into one [H, 3H] 'qkv' projection (biases
    likewise). Column-concatenation leaves every output element's
    reduction untouched, so fused logits are bit-identical to the
    unfused model's; the win is 2 fewer matmul dispatches per layer per
    decode step. Combine with ``cast_params_for_serving`` (either order)."""
    import flax.core
    params = flax.core.unfreeze(variables["params"])
    for name in list(params):
        layer = params[name]
        if not (isinstance(layer, dict) and "query" in layer):
            continue
        layer = dict(layer)
        fused = {}
        for part in ("kernel", "bias"):
            fused[part] = jnp.concatenate(
                [layer[k][part] for k in ("query", "key", "value")], axis=-1)
        for k in ("query", "key", "value"):
            del layer[k]
        layer["qkv"] = fused
        params[name] = layer
    return {**variables, "params": params}


def make_seq2seq_sampler(model: GroverLM, max_len: int, prefix_len: int,
                         p_for_topp: float = 0.95,
                         eos_token: int = 3,
                         ignore_pad_only: bool = True,
                         k_prefilter: int = 128,
                         sample_rng_impl: str = "auto",
                         report_probs: bool = True):
    """Build a jitted seq2seq sampler.

    fn(params, initial_context [B, L0] (pad = generate here), key)
      -> (tokens [B, max_len], probs [B, max_len])

    report_probs: when False, the per-position token-probability chain
    (a full-vocab logsumexp + gather + exp per decode step, plus the
    chunked context-prob pass after prefill — the reference's prev_probs,
    :694-810) is skipped and the returned probs are all-zero. The serving
    path needs probs for context perplexity; pure-generation callers
    don't, and the chain is measurable convert/reduce time in the
    latency-bound decode loop (round-4 decode profile, PERF.md).

    prefix_len must be a static int <= every row's context length (the
    reference uses min over non-empty rows, :834-838): positions <
    prefix_len are processed in one prefill pass; after that one token per
    while_loop step, each sampled token overridden by the context token when
    the context has one (the force-feeding denoise interface).

    sample_rng_impl: PRNG impl for the per-step sampling bits — 'auto'
    (TPU-native rbg on tpu/axon, threefry elsewhere), 'rbg', 'threefry'.
    The decode step is latency-bound small ops; threefry's chained-u32
    gumbel draws are pure overhead there (the dropout-RNG finding, PERF.md
    round 4, applied to serving). Distribution unchanged; stream differs.
    """
    cfg = model.cfg
    assert 0 < prefix_len
    ignore_ids = (jnp.arange(cfg.vocab_size) == cfg.pad_token_id) \
        if ignore_pad_only else None

    def fn(params, initial_context, key):
        if sample_rng_impl != "threefry" and (
                sample_rng_impl != "auto"
                or jax.default_backend() in ("tpu", "axon")):
            from merlot_tpu.ops.sampling import rekey
            key = rekey(key, "rbg" if sample_rng_impl == "auto"
                        else sample_rng_impl)
        b, l0 = initial_context.shape
        tokens = jnp.full((b, max_len), cfg.pad_token_id, jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, initial_context[:, :prefix_len], (0, 0))
        probs = jnp.zeros((b, max_len), jnp.float32)
        row_valid = jnp.any(initial_context != cfg.pad_token_id, axis=1)

        cache = model.empty_cache(b, max_len)
        # prefill WITHOUT the in-model logits head: [B, prefix, V] fp32 is
        # 6 GB at batch 32 (and its softmax another 6 GB) while only the
        # per-position target probability and the last row are consumed —
        # compute both from the hidden states in position chunks
        _, cache, h = model.apply(params, initial_context[:, :prefix_len],
                                  cache=cache, position_offset=0,
                                  return_hidden=True, compute_logits=False)
        # context-token probabilities (prev_probs analogue, for perplexity):
        # exp(logit_target - logsumexp) == softmax(...)[target]
        tgt = initial_context[:, 1:prefix_len]
        chunk = 128
        pieces = []
        for c0 in range(0, prefix_len - 1, chunk) if report_probs else ():
            c1 = min(c0 + chunk, prefix_len - 1)
            lg = lm_logits_for_hidden(params, cfg, h[:, c0:c1])
            lse = jax.scipy.special.logsumexp(lg, axis=-1)
            tp = jnp.take_along_axis(lg, tgt[:, c0:c1, None], axis=-1)[..., 0]
            pieces.append(jnp.exp(tp - lse))
        if pieces:
            ctx_probs = jnp.concatenate(pieces, axis=1)
            probs = jax.lax.dynamic_update_slice(probs, ctx_probs, (0, 1))
        logits_last = lm_logits_for_hidden(
            params, cfg, h[:, prefix_len - 1:prefix_len])[:, 0]

        def pick_token(pos, logits_last, k):
            sampled = top_p_sample(k, logits_last, p_for_topp, ignore_ids,
                                   k_prefilter=k_prefilter)
            # force-feed: if the padded context still has a token at pos, use it
            in_ctx = pos < l0
            ctx_tok = jax.lax.dynamic_slice_in_dim(
                initial_context, jnp.minimum(pos, l0 - 1), 1, axis=1)[:, 0]
            use_ctx = in_ctx & (ctx_tok != cfg.pad_token_id)
            tok = jnp.where(use_ctx, ctx_tok, sampled)
            if not report_probs:
                return tok, jnp.zeros((b,), jnp.float32)
            # softmax(logits)[tok] as exp(logit - logsumexp): one reduce
            # instead of a full-vocab probs tensor in the decode loop
            # (the loop body is latency-bound small ops — PERF.md round 4
            # decode profile: the sampler side, not the 24 layers, is the
            # gap above the byte roofline)
            lse = jax.scipy.special.logsumexp(logits_last, axis=-1)
            lg_tok = jnp.take_along_axis(
                logits_last, tok[:, None], axis=-1)[:, 0]
            pr = jnp.exp(lg_tok - lse)
            return tok, pr

        key0, key_loop = jax.random.split(key)
        tok, pr = pick_token(prefix_len, logits_last, key0)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None],
                                              (0, prefix_len))
        probs = jax.lax.dynamic_update_slice(probs, pr[:, None],
                                             (0, prefix_len))

        def cond(state):
            pos, tokens, probs, cache, k = state
            done = jnp.any(tokens == eos_token, axis=1) | (~row_valid)
            return (pos < max_len) & (~jnp.all(done))

        def body(state):
            pos, tokens, probs, cache, k = state
            k, k_step = jax.random.split(k)
            last = jax.lax.dynamic_slice(tokens, (0, pos - 1), (b, 1))
            logits, cache = model.apply(params, last, cache=cache,
                                        position_offset=pos - 1)
            tok, pr = pick_token(pos, logits[:, 0], k_step)
            tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, pos))
            probs = jax.lax.dynamic_update_slice(probs, pr[:, None], (0, pos))
            return (pos + 1, tokens, probs, cache, k)

        _, tokens, probs, _, _ = jax.lax.while_loop(
            cond, body, (prefix_len + 1, tokens, probs, cache, key_loop))
        return tokens, probs

    return jax.jit(fn)
