"""MerlotModel — the joint video-frame + caption encoder, TPU-native.

Parity target: model/modeling.py (reference). The public surface is
preserved: the forward pass produces ``encoder_hidden_states['viz'|'lang']``
(fp32), the contrastive targets ``img_trg_h``/``lang_trg_h``, the masking
info, and the shape algebra B/L/P (reference: model/modeling.py:234-248).

Architecture recap (per forward):
  * every frame runs through the ViT backbone; CLS#1 is the image-side
    contrastive feature, CLS#0 + the 2x2-pooled grid feed the joint encoder
    (reference: :99-104);
  * a language-only tower (weights shared with the joint encoder when
    ``share_params``) produces per-chunk CLS contrastive features and the
    per-token attention mass that guides SpanBERT masking (:339-489);
  * vision tokens get a per-segment index PE (shuffled index for the
    temporal-ordering objective) plus a fresh 2-D grid PE (:299-337);
  * the joint bidirectional transformer runs over [viz ‖ lang] (:151-174).

TPU-first notes: bf16 compute / fp32 master params throughout; no 2-D
flattening or input transposition; attention probs are only materialized on
the telemetry path; batch (B) is the only dimension the train step shards
over 'data', while head/MLP dims carry 'model'-axis annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.nn.layers import DenseTN, LayerNorm, trunc_normal
from merlot_tpu.nn.transformer import TransformerEncoder, TransformerHParams
from merlot_tpu.nn.vit import PositionEmbedder2D, VisionBackbone
from merlot_tpu.ops.activations import gelu
from merlot_tpu.ops.masking import attention_guided_span_mask


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=True), eps))


class ProjectAndNorm(nn.Module):
    """Optional gelu-dense + LN, then dense + L2 normalize
    (reference: model/modeling.py:18-44)."""
    out_dim: int
    add_intermediate: bool = False
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.add_intermediate:
            x = DenseTN(self.out_dim, dtype=jnp.float32,
                        initializer_range=self.initializer_range,
                        name="intermediate")(x)
            x = gelu(x)
            x = LayerNorm(name="ln")(x)
        x = DenseTN(self.out_dim, dtype=jnp.float32,
                    initializer_range=self.initializer_range, name="proj")(x)
        return _l2_normalize(x, axis=-1)


class TemporalHead(nn.Module):
    """Pairwise 4-way ordering MLP (reference: model/modeling.py:553-596)."""
    hidden_size: int
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, h_joint: jnp.ndarray) -> jnp.ndarray:
        h0 = DenseTN(self.hidden_size, dtype=jnp.float32,
                     initializer_range=self.initializer_range, name="intermediate")(h_joint)
        h0 = gelu(h0)
        h0 = LayerNorm(name="ln0")(h0)
        return DenseTN(4, dtype=jnp.float32,
                       initializer_range=self.initializer_range, name="logits")(h0)


class MerlotModel(nn.Module):
    cfg: MerlotConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.bfloat16 if c.use_bfloat16 else jnp.float32
        self.compute_dtype = dtype

        vit_hp = TransformerHParams(
            hidden_size=c.hidden_size, num_layers=c.vit_num_layers,
            num_heads=c.num_attention_heads, intermediate_size=c.intermediate_size,
            initializer_range=c.initializer_range,
            hidden_dropout_prob=(c.vit_hidden_dropout_prob
                                 if c.vit_hidden_dropout_prob is not None
                                 else c.hidden_dropout_prob),
            attention_probs_dropout_prob=c.attention_probs_dropout_prob,
            dtype=dtype, scan_layers=c.scan_layers, remat=c.remat,
            remat_policy=c.remat_policy,
            softmax_fp32=c.attention_softmax_fp32,
            fuse_ln_matmul=c.fuse_ln_matmul, fused_qkv=c.fused_qkv,
            fused_qkv_params=c.fused_qkv_params)
        self.vision_backbone = VisionBackbone(
            patch_size=c.patch_size, hidden_size=c.hidden_size,
            num_cls_emb=c.num_cls_emb, resnet_layers=tuple(c.resnet_layers),
            spatial_pool_size=c.spatial_pool_size, vit_hp=vit_hp,
            initializer_range=c.initializer_range, dtype=dtype,
            stem_space_to_depth=c.stem_space_to_depth,
            name="vision_backbone")

        joint_hp = dataclasses.replace(vit_hp, num_layers=c.num_hidden_layers,
                                       hidden_dropout_prob=c.hidden_dropout_prob)
        self.encoder = TransformerEncoder(joint_hp, name="encoder")
        if not c.share_params:
            lang_hp = dataclasses.replace(joint_hp,
                                          num_layers=c.num_lang_transformer_hidden_layers)
            self.langonly_encoder = TransformerEncoder(lang_hp, name="langonly_encoder")

        tn = trunc_normal(c.initializer_range)
        self.word_embeddings = self.param(
            "word_embeddings", tn, (c.vocab_size, c.hidden_size), jnp.float32)
        self.joint_pos_table = self.param(
            "position_embeddings", tn, (c.max_position_embeddings, c.hidden_size),
            jnp.float32)
        self.joint_embed_norm = LayerNorm(name="embed_norm")
        self.langonly_pos_table = self.param(
            "langonly_position_embeddings", tn,
            (c.max_position_embeddings, c.hidden_size), jnp.float32)
        self.langonly_embed_norm = LayerNorm(name="langonly_embed_norm")
        self.embed_dropout = nn.Dropout(c.hidden_dropout_prob)

        # vision-side per-segment index PE + fresh 2-D grid PE after pooling
        self.img_idx_pe = self.param(
            "img_idx_pe", tn, (c.max_vision_pos_embeddings, c.hidden_size), jnp.float32)
        self.final_pe2d = PositionEmbedder2D(
            c.hidden_size, max_nimg=1, num_cls_emb=1,
            initializer_range=c.initializer_range, name="final_pe")
        self.viz_final_ln = LayerNorm(name="viz_final_ln")

        # lm head (tied to word_embeddings; reference: model/modeling.py:205-224)
        if c.do_projection:
            self.lm_projection = DenseTN(c.hidden_size, dtype=jnp.float32,
                                         initializer_range=c.initializer_range,
                                         name="lm_projection")
            self.lm_projection_ln = LayerNorm(name="lm_projection_ln")
        if c.do_bias:
            self.lm_output_bias = self.param(
                "lm_output_bias", nn.initializers.zeros, (c.vocab_size,), jnp.float32)

        # contrastive projections
        self.lang_proj = ProjectAndNorm(c.contrastive_dim,
                                        add_intermediate=c.do_projection,
                                        initializer_range=c.initializer_range,
                                        name="contrastive_lang_proj")
        self.viz_proj = ProjectAndNorm(c.contrastive_dim,
                                       add_intermediate=c.do_projection,
                                       initializer_range=c.initializer_range,
                                       name="contrastive_viz_proj")

        # temporal ordering heads
        self.lang_viz_temporal = TemporalHead(c.hidden_size, c.initializer_range,
                                              name="lang_viz_temporal")
        self.viz_viz_temporal = TemporalHead(c.hidden_size, c.initializer_range,
                                             name="viz_viz_temporal")

    # ------------------------------------------------------------------
    def embed_words(self, ids_2d: jnp.ndarray, which: str = "joint",
                    deterministic: bool = True) -> jnp.ndarray:
        """Word + position embedding, LN (fp32), dropout, cast to compute dtype.

        reference: model/modeling.py:262-297. Uses a plain gather — modern XLA
        lowers it efficiently on TPU; the reference's one-hot-matmul trick is
        a TF1-era workaround.
        """
        L = ids_2d.shape[1]
        assert L <= self.cfg.max_position_embeddings, \
            (L, self.cfg.max_position_embeddings)
        word = jnp.take(self.word_embeddings, ids_2d, axis=0)
        if which == "joint":
            pos = self.joint_pos_table[:L][None]
            normed = self.joint_embed_norm(word + pos)
        else:
            pos = self.langonly_pos_table[:L][None]
            normed = self.langonly_embed_norm(word + pos)
        normed = self.embed_dropout(normed, deterministic=deterministic)
        return normed.astype(self.compute_dtype)

    def vision_pos_emb(self, B: int, group: int, viz_chunk_len: int,
                       num_h: int, num_w: int,
                       shuffled_idx_img: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Per-segment index PE (+64/+16 offsets come in via shuffled ids) plus
        2-D grid PE (reference: model/modeling.py:299-337). fp32 [B or 1, P, H]."""
        c = self.cfg
        n = group * c.num_imgs
        if shuffled_idx_img is None:
            pe = self.img_idx_pe[:n]                                  # [n, H]
            pe = jnp.repeat(pe[:, None], viz_chunk_len, axis=1)       # [n, vcl, H]
            pe = pe.reshape(1, n * viz_chunk_len, c.hidden_size)
        else:
            flat = shuffled_idx_img.reshape(-1)                       # [B*group]
            pe = jnp.take(self.img_idx_pe, flat, axis=0)
            pe = jnp.repeat(pe[:, None], viz_chunk_len, axis=1)
            pe = pe.reshape(B, group * viz_chunk_len, c.hidden_size)

        grid_pe = self.final_pe2d(num_h, num_w, 1)                    # [(1+hw), H]
        pe = pe + jnp.tile(grid_pe, (n, 1))[None]
        return pe

    # ------------------------------------------------------------------
    def __call__(self, image: jnp.ndarray, input_ids: jnp.ndarray, *,
                 mask_input: bool = False,
                 shuffled_idx_img: Optional[jnp.ndarray] = None,
                 img_mask: Optional[jnp.ndarray] = None,
                 collect_attention: str = "none",
                 deterministic: bool = True,
                 attn_backend: str = "auto",
                 attn_backend_vit: Optional[str] = None,
                 attn_backend_lang: Optional[str] = None) -> Dict[str, Any]:
        """Forward pass.

        Args:
          image: [n_images, h, w, 3] float in [0,1]; n_images =
                 (text_batch/num_texts) * num_chunks * num_imgs.
          input_ids: [batch, num_chunks, L_chunk] int32, or [batch, L] (chunks=1).
          mask_input: run the lang-only tower + attention-guided masking.
          shuffled_idx_img: [batch, num_chunks] per-segment PE index.
          img_mask: [batch, num_chunks] validity (None = all valid).
          collect_attention: 'none' | 'probs' (adds cross-modal telemetry).
        """
        c = self.cfg
        if input_ids.ndim == 2:
            batch_size, lang_chunk_len = input_ids.shape
            num_chunks = 1
            group = 1
            input_ids3 = input_ids[:, None]
        else:
            batch_size, num_chunks, lang_chunk_len = input_ids.shape
            group = c.num_chunks_in_group or num_chunks
            assert num_chunks % group == 0
            input_ids3 = input_ids

        B = batch_size * (num_chunks // group)
        L = lang_chunk_len * group

        # ---------------- vision tower --------------------------------
        # attn_backend_vit lets training run the pallas kernel in the ViT
        # tower only (the remote compile helper cannot hold all three
        # towers' kernel instances in one program — PERF.md round 2)
        vinfo = self.vision_backbone(
            image, deterministic=deterministic,
            attn_backend=attn_backend_vit or attn_backend)
        num_h, num_w = vinfo["num_h"], vinfo["num_w"]
        viz_chunk_len = num_h * num_w + 1
        P = viz_chunk_len * group

        img_trg_h = vinfo["cls"][:, 1].astype(jnp.float32)
        image_feats = jnp.concatenate(
            [vinfo["cls"][:, 0:1], vinfo["seq"]], axis=1).astype(jnp.float32)

        img_batch_size = batch_size // c.num_texts
        if img_mask is None:
            img_mask2 = jnp.ones((B // c.num_texts, c.num_imgs), bool)
        else:
            img_mask2 = img_mask.reshape(B // c.num_texts, c.num_imgs)

        if c.num_imgs > 1 or c.num_texts > 1:
            image_feats = image_feats.reshape(
                img_batch_size, c.num_imgs, *image_feats.shape[1:])
            if c.num_texts > 1:
                image_feats = jnp.repeat(image_feats[:, None], c.num_texts, axis=1)
                image_feats = image_feats.reshape(B, c.num_imgs,
                                                  *image_feats.shape[3:])
                img_mask2 = jnp.repeat(img_mask2[:, None], c.num_texts, axis=1)
                img_mask2 = img_mask2.reshape(B, c.num_imgs)

        image_feats = image_feats.reshape(B, P * c.num_imgs, c.hidden_size)
        img_valid = jnp.repeat(img_mask2[:, :, None], P, axis=2).reshape(
            B, P * c.num_imgs)

        image_feats = image_feats + self.vision_pos_emb(
            B, group, viz_chunk_len, num_h, num_w, shuffled_idx_img)
        image_feats = self.viz_final_ln(image_feats).astype(self.compute_dtype)

        # ---------------- language tower + masking --------------------
        out: Dict[str, Any] = {}
        if mask_input:
            lang_trg_h, attn_mass = self._langonly(
                input_ids3, batch_size, num_chunks, lang_chunk_len,
                deterministic=deterministic,
                attn_backend=attn_backend_lang or attn_backend)
            out["lang_trg_h"] = lang_trg_h
            ids_2d = input_ids3.reshape(B, L)
            masked_ids, masked_idx = attention_guided_span_mask(
                self.make_rng("masking"), ids_2d, attn_mass.reshape(B, L),
                vocab_size=c.vocab_size,
                masking_rate=c.masking_rate,
                topk_perc=c.masking_use_topk_from_attn_perc,
                choose_topk_prob=c.masking_choose_topk_prob,
                do_spanbert=c.masking_do_spanbert,
                spanbert_len_probs=c.masking_spanbert_len_probs,
                use_attn=c.masking_use_attn)
            out["lang_mask_info"] = {"masked_ids": masked_ids, "masked_idx": masked_idx}
            ids_to_use = masked_ids
        else:
            ids_to_use = input_ids3.reshape(B, L)

        lang_embs = self.embed_words(ids_to_use, which="joint",
                                     deterministic=deterministic)
        lang_valid = (ids_to_use != 0)

        # ---------------- joint encoder -------------------------------
        encoder_input = jnp.concatenate([image_feats, lang_embs], axis=1)
        is_valid = jnp.concatenate([img_valid, lang_valid], axis=1)
        attention_mask = (is_valid[:, None] & is_valid[:, :, None]).astype(jnp.float32)

        if c.disable_pairwise_lang_attn:
            # vision attends everywhere; lang chunks only within their segment
            # (reference: model/modeling.py:160-168)
            seg = jnp.concatenate([
                jnp.zeros(P * c.num_imgs, jnp.int32),
                1 + jnp.arange(L, dtype=jnp.int32) // lang_chunk_len], axis=0)
            can = (seg[:, None] == seg[None]) | (seg == 0)[None] | (seg == 0)[:, None]
            attention_mask = attention_mask * can.astype(jnp.float32)[None]

        einfo = self.encoder(encoder_input, attention_mask,
                             collect="probs" if collect_attention == "probs" else "none",
                             deterministic=deterministic, attn_backend=attn_backend)
        hidden = einfo["hidden_state"]

        out.update({
            "encoder_hidden_states": {
                "viz": hidden[:, :P * c.num_imgs].astype(jnp.float32),
                "lang": hidden[:, P * c.num_imgs:].astype(jnp.float32),
            },
            "img_trg_h": img_trg_h,
            "is_valid": is_valid,
            "shapes": {"B": B, "L": L, "P": P, "viz_chunk_len": viz_chunk_len,
                       "lang_chunk_len": lang_chunk_len, "group": group,
                       "num_h": num_h, "num_w": num_w,
                       "batch_size": batch_size, "num_chunks": num_chunks},
            "input_ids": input_ids3,
        })

        if collect_attention == "probs":
            out["attention_log"] = self._attention_log(
                einfo["attn_probs"], is_valid, P * c.num_imgs)
        return out

    # ------------------------------------------------------------------
    def _langonly(self, input_ids3, batch_size, num_chunks, lang_chunk_len, *,
                  deterministic, attn_backend):
        """Language-only tower: per-chunk CLS features + attention mass
        (reference: model/modeling.py:339-379)."""
        c = self.cfg
        if c.langonly_num_chunks_in_group is not None:
            g = c.langonly_num_chunks_in_group
            assert num_chunks % g == 0
            ids_2d = input_ids3.reshape(batch_size * (num_chunks // g),
                                        lang_chunk_len * g)
        else:
            ids_2d = input_ids3.reshape(batch_size, lang_chunk_len * num_chunks)

        word_embs = self.embed_words(ids_2d, which="langonly",
                                     deterministic=deterministic)
        valid = (ids_2d != 0)
        mask = (valid[:, None] & valid[:, :, None]).astype(jnp.float32)

        enc = self.encoder if c.share_params else self.langonly_encoder
        n_layers = c.num_lang_transformer_hidden_layers if c.share_params else None
        info = enc(word_embs, mask, collect="colsum", deterministic=deterministic,
                   attn_backend=attn_backend, num_layers=n_layers)

        pooled = info["hidden_state"].reshape(
            batch_size * num_chunks, lang_chunk_len, c.hidden_size)[:, 0]
        return pooled.astype(jnp.float32), info["attn_colsum"]

    def _attention_log(self, probs, is_valid, p_len):
        """Cross-modal attention-mass telemetry (reference: modeling.py:186-203)."""
        # probs: [B, num_layers, S, S] head-meaned; mean over layers
        sp = jnp.mean(probs, axis=1).astype(jnp.float32)
        vf = is_valid.astype(jnp.float32)
        sp = sp * vf[:, None] * vf[:, :, None]
        sp = jnp.mean(sp, axis=0)
        sp = sp / jnp.sum(sp)
        pieces = {"viz": (0, p_len), "lang": (p_len, sp.shape[0])}
        log = {}
        for to_name, (ts, te) in pieces.items():
            for from_name, (fs, fe) in pieces.items():
                log[f"encoder/{from_name}2{to_name}"] = jnp.sum(sp[ts:te, fs:fe])
        return log

    # ------------------------------------------------------------------
    # heads (callable via nn apply method= or from wrapper modules)
    # ------------------------------------------------------------------
    def lm_logits(self, hidden_state: jnp.ndarray) -> jnp.ndarray:
        """Tied-embedding LM head (reference: model/modeling.py:205-224)."""
        c = self.cfg
        h = hidden_state.astype(jnp.float32)
        if c.do_projection:
            h = self.lm_projection_ln(gelu(self.lm_projection(h)))
        logits = jnp.dot(h, self.word_embeddings.T,
                         preferred_element_type=jnp.float32)
        if c.do_bias:
            logits = logits + self.lm_output_bias
        return logits

    def contrastive_features(self, lang_trg_h: jnp.ndarray,
                             img_trg_h: jnp.ndarray):
        return self.lang_proj(lang_trg_h), self.viz_proj(img_trg_h)

    def temporal_logits(self, xa: jnp.ndarray, xb: jnp.ndarray,
                        which: str = "lang_viz") -> jnp.ndarray:
        """All-pairs 4-way temporal logits (reference: modeling.py:553-596).

        xa, xb: [B, group, H] -> [B*group^2, 4]; pair (i, j) classes:
        0 different-video, 1 same position, 2 i<j, 3 i>j.
        """
        b, g, h = xa.shape
        xa_t = jnp.repeat(xa[:, :, None], g, axis=2).reshape(b, g * g, h)
        xb_t = jnp.repeat(xb[:, None], g, axis=1).reshape(b, g * g, h)
        h_joint = jnp.concatenate([xa_t, xb_t], axis=2).reshape(b * g * g, 2 * h)
        head = self.lang_viz_temporal if which == "lang_viz" else self.viz_viz_temporal
        return head(h_joint.astype(jnp.float32))
