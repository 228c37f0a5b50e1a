"""Pre-LN transformer encoder stack.

Behavioural parity with the reference stack (utils/transformer.py:171-247):
per layer ``x += attn(LN(x)); x += mlp(LN(x))``, final LN, exact-erf gelu MLP,
additive ``-1e10`` masking.

TPU-first divergences (deliberate):
  * activations stay 3-D [B, S, H] — the reference flattens to 2-D "like
    BERT" to dodge TF1-era TPU reshapes; XLA handles batched matmuls
    natively, so the flattening would only obscure sharding annotations.
  * softmax statistics in fp32 by default (hp.softmax_fp32=False restores
    the reference's bf16 softmax — faster, and what the released model
    trained with).
  * validity masks are pre-converted to one additive bias per forward
    (except on the colsum path, which keeps the reference's multiply form).
  * attention-prob materialization is opt-in via ``collect``:
    'none' (fused fast path), 'colsum' (per-key attention mass for
    attention-guided masking), 'probs' (head-meaned maps for telemetry).
  * the layer stack runs either unrolled or as lax.scan over stacked params
    (hp.scan_layers), with optional per-layer remat (hp.remat).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from merlot_tpu.nn.layers import DenseTN, LayerNorm
from merlot_tpu.ops.activations import gelu
from merlot_tpu.ops.attention import attention_core


def _remat_policy(name: Optional[str]):
    if name is None:
        return None
    cp = jax.checkpoint_policies
    return {
        "dots": cp.dots_saveable,
        "dots_no_batch": cp.dots_with_no_batch_dims_saveable,
        # save the softmax probs (tagged in ops/attention.py) and nothing
        # else: the backward reuses them like XLA's default autodiff does,
        # while MLP/gelu/LN recompute — the inverse of 'dots', sized for
        # making bigger per-chip batches fit (probs bf16 [B,H,S,S] is the
        # one tensor whose recompute costs two extra matmul passes)
        "probs": cp.save_only_these_names("attn_probs"),
        # probs + weight-stationary matmul outputs (cheap, batch-free)
        "probs_dots": cp.save_from_both_policies(
            cp.save_only_these_names("attn_probs"),
            cp.dots_with_no_batch_dims_saveable),
    }[name]


@dataclass(frozen=True)
class TransformerHParams:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    initializer_range: float = 0.02
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.0
    dtype: Any = jnp.bfloat16
    # lax.scan over layers: one compiled layer body instead of an unrolled
    # stack — ~12x smaller XLA graph / compile time, same math. Param layout
    # becomes [num_layers, ...] stacked (handled by sharding rules + ckpt io)
    scan_layers: bool = False
    # remat at the layer boundary: recompute activations in backward to
    # trade FLOPs for HBM (jax.checkpoint / nn.remat)
    remat: bool = False
    # what the layer remat SAVES (None = recompute everything):
    #   'dots'          — keep every matmul output, recompute elementwise
    #                     only (gelu/LN/softmax); nearly-free backward at a
    #                     fraction of full-activation memory
    #   'dots_no_batch' — keep only weight-stationary matmuls
    remat_policy: Optional[str] = None
    # fp32 softmax (safer) vs compute-dtype softmax (the reference's bf16
    # behaviour; halves attention HBM traffic)
    softmax_fp32: bool = True
    # fuse each pre-LN into its consumer matmuls (attn_ln -> q/k/v,
    # mlp_ln -> intermediate) via the pallas LN+matmul kernel: the
    # normalized tensor never round-trips HBM (ops/pallas_ln_matmul.py).
    # Param tree, init and checkpoint layout are unchanged; falls back to
    # the exact unfused math off-TPU / at unsupported shapes. Skipped
    # automatically on cross-attention / KV-cache calls.
    fuse_ln_matmul: bool = False
    # one [H, 3H] q/k/v projection per attention instead of three [H, H]s
    # (fewer fusion boundaries feeding the attention kernel; per-column
    # dot products unchanged so outputs are bit-identical). Weights stay
    # three separate checkpoint params, concatenated at apply time.
    # Skipped on cross-attention (k/v read a different source).
    fused_qkv: bool = False
    # CANONICAL fused form: the param tree itself stores ONE
    # attention/qkv/{kernel [H,3H], bias [3H]} per attention (columns
    # ordered q|k|v) instead of three query/key/value entries — no
    # apply-time concat at all (the tax the fused_qkv A/B measured,
    # PERF.md round 4). Checkpoints on disk stay in the reference-split
    # form: train/checkpoint.fuse_qkv_tree / unfuse_qkv_tree convert at
    # the save/restore boundary (exact slicing both ways). Self-attention
    # only (cross-attention projects k/v from a different source);
    # mutually exclusive with fused_qkv / fuse_ln_matmul.
    fused_qkv_params: bool = False


class SelfAttention(nn.Module):
    """MHA with the reference attention_layer's full surface
    (utils/transformer.py:33-138): optional cross-attention source
    (``x_enc``, the x_enc_flat analogue) and an optional preallocated KV
    cache written at ``cache_pos`` (the cache/do_cache analogue, but with
    static-shape dynamic_update_slice instead of growing concats)."""
    hp: TransformerHParams

    @nn.compact
    def __call__(self, x_norm: jnp.ndarray, mask: Optional[jnp.ndarray], *,
                 collect: str = "none", deterministic: bool = True,
                 attn_backend: str = "auto", mask_format: str = "multiplicative",
                 x_enc: Optional[jnp.ndarray] = None,
                 cache: Optional[dict] = None, cache_pos=0,
                 ln_params=None):
        """ln_params: fp32 (gamma, beta) of the pre-attention LN. When
        given, ``x_norm`` is the RAW residual stream and the LN is fused
        into the q/k/v projections (ops.pallas_ln_matmul; identical math,
        z never materialized). Self-attention only."""
        hp = self.hp
        b, s, h = x_norm.shape
        d_head = hp.hidden_size // hp.num_heads

        def proj(name, src):
            y = DenseTN(hp.hidden_size, dtype=hp.dtype,
                        initializer_range=hp.initializer_range, name=name)(src)
            return y.reshape(b, src.shape[1], hp.num_heads, d_head)

        if ln_params is not None:
            assert x_enc is None, "fused LN requires self-attention"
            from merlot_tpu.ops.pallas_ln_matmul import ln_matmul
            wq, bq = DenseTN(hp.hidden_size, dtype=hp.dtype,
                             initializer_range=hp.initializer_range,
                             name="query")(x_norm, raw=True)
            wk, bk = DenseTN(hp.hidden_size, dtype=hp.dtype,
                             initializer_range=hp.initializer_range,
                             name="key")(x_norm, raw=True)
            wv, bv = DenseTN(hp.hidden_size, dtype=hp.dtype,
                             initializer_range=hp.initializer_range,
                             name="value")(x_norm, raw=True)
            q3, k3, v3 = ln_matmul(x_norm.astype(hp.dtype), *ln_params,
                                   (wq, wk, wv), (bq, bk, bv))
            q = q3.reshape(b, s, hp.num_heads, d_head)
            k = k3.reshape(b, s, hp.num_heads, d_head)
            v = v3.reshape(b, s, hp.num_heads, d_head)
        elif hp.fused_qkv_params and x_enc is None:
            # canonical fused tree: ONE [H, 3H] param (columns q|k|v) —
            # same per-column dot products as three [H, H] projections,
            # but no per-step kernel concat (PERF.md round 5)
            assert not (hp.fused_qkv or hp.fuse_ln_matmul), \
                "fused_qkv_params excludes fused_qkv/fuse_ln_matmul"
            qkv = DenseTN(3 * hp.hidden_size, dtype=hp.dtype,
                          initializer_range=hp.initializer_range,
                          name="qkv")(x_norm)
            q, k, v = (qkv[..., i * h:(i + 1) * h].reshape(
                b, s, hp.num_heads, d_head) for i in range(3))
        elif hp.fused_qkv and x_enc is None:
            # one [H, 3H] matmul (see TransformerHParams.fused_qkv); the
            # submodules/names are identical to the unfused branch so the
            # param tree (and every checkpoint map) is unchanged
            ws, bss = zip(*(DenseTN(hp.hidden_size, dtype=hp.dtype,
                                    initializer_range=hp.initializer_range,
                                    name=n)(x_norm, raw=True)
                            for n in ("query", "key", "value")))
            w3 = jnp.concatenate(ws, axis=1).astype(hp.dtype)
            b3 = jnp.concatenate(bss).astype(hp.dtype)
            qkv = jnp.dot(x_norm.astype(hp.dtype), w3,
                          preferred_element_type=hp.dtype) + b3
            q, k, v = (qkv[..., i * h:(i + 1) * h].reshape(
                b, s, hp.num_heads, d_head) for i in range(3))
        else:
            assert not hp.fused_qkv_params, \
                "fused_qkv_params is self-attention only (cross-attention " \
                "projects k/v from a different source)"
            kv_src = x_enc if x_enc is not None else x_norm
            q = proj("query", x_norm)
            k = proj("key", kv_src)
            v = proj("value", kv_src)

        new_cache = None
        if cache is not None:
            ck = jax.lax.dynamic_update_slice(
                cache["k"], k.astype(cache["k"].dtype), (0, cache_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(
                cache["v"], v.astype(cache["v"].dtype), (0, cache_pos, 0, 0))
            k, v = ck.astype(q.dtype), cv.astype(q.dtype)
            new_cache = {"k": ck, "v": cv}

        drop_rng = None
        if not deterministic and hp.attention_probs_dropout_prob > 0.0:
            drop_rng = self.make_rng("dropout")

        ctx, extra = attention_core(
            q, k, v, mask, collect=collect,
            dropout_rate=0.0 if deterministic else hp.attention_probs_dropout_prob,
            dropout_rng=drop_rng, backend=attn_backend,
            softmax_fp32=hp.softmax_fp32, mask_format=mask_format)

        out = DenseTN(hp.hidden_size, dtype=hp.dtype,
                      initializer_range=hp.initializer_range,
                      name="out_proj")(ctx.reshape(b, s, hp.hidden_size))
        out = nn.Dropout(hp.hidden_dropout_prob)(out, deterministic=deterministic)
        return out, extra, new_cache


class MlpBlock(nn.Module):
    hp: TransformerHParams

    @nn.compact
    def __call__(self, x_norm: jnp.ndarray, *, deterministic: bool = True,
                 ln_params=None):
        """ln_params: fp32 (gamma, beta) of the pre-MLP LN; when given,
        ``x_norm`` is the raw residual stream and the LN fuses into the
        intermediate matmul (ops.pallas_ln_matmul)."""
        hp = self.hp
        inter = DenseTN(hp.intermediate_size, dtype=hp.dtype,
                        initializer_range=hp.initializer_range,
                        name="intermediate")
        if ln_params is not None:
            from merlot_tpu.ops.pallas_ln_matmul import ln_matmul
            wi, bi = inter(x_norm, raw=True)
            (h0,) = ln_matmul(x_norm.astype(hp.dtype), *ln_params,
                              (wi,), (bi,))
        else:
            h0 = inter(x_norm)
        h0 = gelu(h0)
        out = DenseTN(hp.hidden_size, dtype=hp.dtype,
                      initializer_range=hp.initializer_range, name="output")(h0)
        return nn.Dropout(hp.hidden_dropout_prob)(out, deterministic=deterministic)


class TransformerLayer(nn.Module):
    hp: TransformerHParams

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 collect: str = "none", deterministic: bool = True,
                 attn_backend: str = "auto", mask_format: str = "multiplicative",
                 x_enc: Optional[jnp.ndarray] = None,
                 cache: Optional[dict] = None, cache_pos=0):
        # fused pre-LN path: pass the RAW residual stream + LN params so
        # the normalize happens inside the projection kernel; the unfused
        # branch is the reference-literal form. Same params either way.
        fuse = (self.hp.fuse_ln_matmul and x_enc is None and cache is None)
        attn_ln = LayerNorm(name="attn_ln")
        attn = SelfAttention(self.hp, name="attention")
        if fuse:
            attn_out, extra, new_cache = attn(
                x, mask, collect=collect, deterministic=deterministic,
                attn_backend=attn_backend, mask_format=mask_format,
                ln_params=attn_ln(x, raw=True))
        else:
            attn_out, extra, new_cache = attn(
                attn_ln(x), mask, collect=collect,
                deterministic=deterministic, attn_backend=attn_backend,
                mask_format=mask_format, x_enc=x_enc, cache=cache,
                cache_pos=cache_pos)
        x = x + attn_out
        mlp_ln = LayerNorm(name="mlp_ln")
        mlp = MlpBlock(self.hp, name="mlp")
        if fuse:
            mlp_out = mlp(x, deterministic=deterministic,
                          ln_params=mlp_ln(x, raw=True))
        else:
            mlp_out = mlp(mlp_ln(x), deterministic=deterministic)
        x = x + mlp_out
        if cache is not None:
            return x, (extra, new_cache)
        return x, extra


class _LayerForScan(nn.Module):
    """TransformerLayer with static options baked into module attrs so
    nn.scan sees a clean (carry, broadcast-input) signature."""
    hp: TransformerHParams
    collect: str
    deterministic: bool
    attn_backend: str
    mask_format: str = "multiplicative"

    @nn.compact
    def __call__(self, x, mask):
        x, extra = TransformerLayer(self.hp, name="layer")(
            x, mask, collect=self.collect, deterministic=self.deterministic,
            attn_backend=self.attn_backend, mask_format=self.mask_format)
        if extra is None:
            extra = jnp.zeros((), jnp.float32)  # scan needs a concrete output
        return x, extra


class TransformerEncoder(nn.Module):
    """Stack of pre-LN layers + final LN.

    Two execution modes:
      * unrolled python loop (default; supports num_layers prefix runs);
      * hp.scan_layers: lax.scan over a stacked-param layer (12x smaller XLA
        program; params live under 'layers' with a leading layer axis).
    hp.remat checkpoints each layer (activations recomputed in backward).

    Returns dict with:
      hidden_state [B, S, H] (compute dtype)
      attn_colsum  [B, S] fp32, summed over layers, head-meaned, query-summed
                   (collect='colsum')
      attn_probs   [B, num_layers, S, S] fp32 head-meaned (collect='probs')
    """
    hp: TransformerHParams

    def init_cache(self, batch_size: int, max_len: int,
                   dtype=None) -> Dict[str, jnp.ndarray]:
        """Preallocated per-layer KV buffers {'k00','v00',...}
        [B, max_len, heads, d] — flat entries alias in place across decode
        steps (a stacked [L, ...] pair pays slice+stack copies per step).
        dtype defaults to hp.dtype so a bf16 encoder gets a bf16 cache."""
        hp = self.hp
        if dtype is None:
            dtype = hp.dtype
        shape = (batch_size, max_len, hp.num_heads,
                 hp.hidden_size // hp.num_heads)
        out: Dict[str, jnp.ndarray] = {}
        for i in range(hp.num_layers):
            out[f"k{i:02d}"] = jnp.zeros(shape, dtype)
            out[f"v{i:02d}"] = jnp.zeros(shape, dtype)
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray], *,
                 collect: str = "none", deterministic: bool = True,
                 attn_backend: str = "auto",
                 num_layers: Optional[int] = None,
                 x_enc: Optional[jnp.ndarray] = None,
                 cache: Optional[Dict[str, jnp.ndarray]] = None,
                 cache_pos=0) -> Dict[str, jnp.ndarray]:
        """x_enc: cross-attention source [B, S_enc, H] (K/V come from it).
        cache: per-layer KV buffers {'k00','v00',...} [B, max_len, heads, d]
        (see ``init_cache``) written at cache_pos; the updated cache is
        returned under 'new_cache'. Both are unrolled-mode only (like the
        reference, which never combines them with scan)."""
        x = x.astype(self.hp.dtype)
        if mask is not None and mask.dtype != jnp.float32:
            mask = mask.astype(jnp.float32)
        if (x_enc is not None or cache is not None) and self.hp.scan_layers:
            raise NotImplementedError("cache/cross-attn require unrolled mode")

        # Precompute the additive mask bias ONCE for the whole stack (saves
        # a [B,H,S,S] multiply per layer; measured 33% faster masked-attn
        # fwd). The colsum path keeps the reference's multiply form so the
        # attention-mass distribution matches exactly; pallas keeps the
        # multiplicative mask interface.
        mask_format = "multiplicative"
        if (mask is not None and collect != "colsum"
                and attn_backend != "pallas"):
            sm_dtype = jnp.float32 if self.hp.softmax_fp32 else self.hp.dtype
            mask = (-1e10 * (1.0 - mask)).astype(sm_dtype)
            mask_format = "bias"

        n = num_layers if num_layers is not None else self.hp.num_layers
        out: Dict[str, jnp.ndarray] = {}

        if self.hp.scan_layers:
            layer_cls = _LayerForScan
            if self.hp.remat:
                layer_cls = nn.remat(layer_cls, prevent_cse=False,
                                     policy=_remat_policy(self.hp.remat_policy))
            scanned = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=self.hp.num_layers,
                metadata_params={nn.PARTITION_NAME: None},
            )(self.hp, collect, deterministic, attn_backend, mask_format,
              name="layers")
            if n == self.hp.num_layers or self.is_initializing():
                # full-depth run; at init this also CREATES the full
                # [num_layers, ...] stacked params even when the first call
                # is a prefix run (values during init are don't-cares)
                x, extras = scanned(x, mask)
                if n != self.hp.num_layers:
                    extras = jax.tree.map(lambda a: a[:n], extras)
            else:
                # prefix run over the stacked params (the shared lang tower
                # configured shallower than the joint stack — reference:
                # model/modeling.py:361-371): slice the leading layer axis
                # and lax.scan the same (possibly remat-wrapped) layer body.
                stacked = self.variables["params"]["layers"]
                sliced = jax.tree.map(lambda a: a[:n], stacked)
                layer = layer_cls(self.hp, collect, deterministic,
                                  attn_backend, mask_format)
                need_rng = (not deterministic
                            and (self.hp.hidden_dropout_prob > 0.0
                                 or self.hp.attention_probs_dropout_prob > 0.0))
                keys = (jax.random.split(self.make_rng("dropout"), n)
                        if need_rng else jnp.zeros((n, 2), jnp.uint32))

                def body(carry, xs):
                    p, key = xs
                    rngs = {"dropout": key} if need_rng else {}
                    y, extra = layer.apply({"params": p}, carry, mask,
                                           rngs=rngs)
                    return y, extra

                x, extras = jax.lax.scan(body, x, (sliced, keys))
            if collect == "colsum":
                out["attn_colsum"] = jnp.sum(extras, axis=0)
            elif collect == "probs":
                out["attn_probs"] = jnp.transpose(extras, (1, 0, 2, 3))
        else:
            colsum = None
            probs_all = []
            new_caches = []
            # num_layers < hp.num_layers runs a prefix of the (shared)
            # stack — how the lang-only tower shares the joint encoder's
            # weights when configured shallower (reference: modeling.py:361-371)
            for i in range(n):
                layer_cls = TransformerLayer
                if self.hp.remat and cache is None:
                    # collect/deterministic/attn_backend/mask_format are
                    # static strings
                    layer_cls = nn.remat(layer_cls, prevent_cse=False,
                                         static_argnums=(3, 4, 5, 6),
                                         policy=_remat_policy(self.hp.remat_policy))
                layer = layer_cls(self.hp, name=f"layer{i:02d}")
                if cache is not None:
                    # per-layer dict entries, not one stacked [L, ...] pair:
                    # a stacked cache costs a dynamic-slice copy per layer
                    # on read plus a full-cache jnp.stack per decode step
                    # (profiled at ~10 ms/step for grover-medium b8 — same
                    # fix as models/grover.py); flat entries alias in place
                    # across decode iterations
                    layer_cache = {"k": cache[f"k{i:02d}"],
                                   "v": cache[f"v{i:02d}"]}
                    x, (extra, nc) = layer(x, mask, collect, deterministic,
                                           attn_backend, mask_format,
                                           x_enc=x_enc, cache=layer_cache,
                                           cache_pos=cache_pos)
                    new_caches.append(nc)
                else:
                    x, extra = layer(x, mask, collect, deterministic,
                                     attn_backend, mask_format, x_enc=x_enc)
                if collect == "colsum":
                    colsum = extra if colsum is None else colsum + extra
                elif collect == "probs":
                    probs_all.append(extra)
            if collect == "colsum":
                out["attn_colsum"] = colsum
            elif collect == "probs":
                out["attn_probs"] = jnp.stack(probs_all, axis=1)
            if cache is not None:
                out["new_cache"] = {}
                for i, c in enumerate(new_caches):
                    out["new_cache"][f"k{i:02d}"] = c["k"]
                    out["new_cache"][f"v{i:02d}"] = c["v"]

        x = LayerNorm(name="final_ln")(x)
        out["hidden_state"] = x
        return out
