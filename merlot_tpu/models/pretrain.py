"""Pretraining objectives: masked LM, contrastive matching, temporal ordering.

Parity targets (reference):
  * mask_loss          — model/modeling.py:528-551
  * contrastive_loss   — model/modeling.py:491-526
  * temporal loss      — model/modeling.py:553-668
  * total = lang + contrastive + temporal, with metric namespaces
    lang/ contr/ temporal/ (model/modeling.py:700-713)

Distributed design difference: the reference all-gathers both contrastive
towers via ``tpu_cross_replica_stack`` and offsets labels by replica index
(utils/model_utils.py:673-707). Here the loss is written **globally** —
``CE(lang @ viz.T / temp, arange(N))`` over the full batch. Under jit with
the batch sharded over the 'data' mesh axis, XLA inserts exactly the
all-gather over ICI that the reference hand-rolled, and the per-row losses
are mathematically identical (each replica's rows of the global logit matrix
are the reference's per-replica logit matrix). Single-device it degrades the
same way the reference's num_shards<=1 path does.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.merlot import MerlotModel
from merlot_tpu.ops.losses import cross_entropy_with_logits


def mask_loss(model: MerlotModel, fwd: Dict[str, Any]) -> Tuple[jnp.ndarray, Dict]:
    s = fwd["shapes"]
    B, L = s["B"], s["L"]
    hidden = fwd["encoder_hidden_states"]["lang"]          # [B, L, H] fp32
    masked_idx = fwd["lang_mask_info"]["masked_idx"]       # [B, M]
    ids_2d = fwd["input_ids"].reshape(B, L)

    pooled = jnp.take_along_axis(hidden, masked_idx[..., None], axis=1)  # [B, M, H]
    targets = jnp.take_along_axis(ids_2d, masked_idx, axis=1)            # [B, M]

    logits = model.lm_logits(pooled.reshape(-1, hidden.shape[-1]))
    targets_flat = targets.reshape(-1)
    raw = cross_entropy_with_logits(logits, targets_flat)

    is_valid = (targets_flat != 0).astype(raw.dtype)
    denom = jnp.sum(is_valid) + 1e-5
    loss = jnp.sum(is_valid * raw) / denom
    is_right = (jnp.argmax(logits, -1).astype(jnp.int32) == targets_flat)
    acc = jnp.sum(is_valid * is_right.astype(jnp.float32)) / denom
    return loss, {"loss": loss, "acc": acc}


def contrastive_loss(model: MerlotModel, fwd: Dict[str, Any],
                     cfg: MerlotConfig) -> Tuple[jnp.ndarray, Dict]:
    lang_x, viz_x = model.contrastive_features(fwd["lang_trg_h"], fwd["img_trg_h"])
    temp = cfg.contrast_temp
    n = lang_x.shape[0]
    labels = jnp.arange(n, dtype=jnp.int32)

    logits = jnp.dot(lang_x, viz_x.T, preferred_element_type=jnp.float32) / temp
    l2v = jnp.mean(cross_entropy_with_logits(logits, labels))
    v2l = jnp.mean(cross_entropy_with_logits(logits.T, labels))

    losses = {"lang_to_viz": l2v, "viz_to_lang": v2l}
    losses["loss_all"] = cfg.contrast_coef * (l2v + v2l) / 2.0
    return losses["loss_all"], losses


def _allpairs_temporal_labels(video_src_ids: jnp.ndarray, group: int) -> jnp.ndarray:
    """4-way labels for every segment pair (reference: modeling.py:598-620)."""
    ga = jnp.arange(group)
    xa = jnp.repeat(ga[:, None], group, axis=1)
    xb = jnp.repeat(ga[None], group, axis=0)
    pos_label = ((xa == xb).astype(jnp.int32)
                 + 2 * (xa < xb).astype(jnp.int32)
                 + 3 * (xa > xb).astype(jnp.int32))
    same_video = (video_src_ids[:, None] == video_src_ids[:, :, None])
    labels = jnp.where(same_video, pos_label[None], 0)
    return labels.reshape(-1)


def temporal_loss(model: MerlotModel, fwd: Dict[str, Any], cfg: MerlotConfig,
                  shuffled_idx_img: jnp.ndarray,
                  video_src_ids: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
    s = fwd["shapes"]
    B, group = s["B"], s["group"]
    h_lang = fwd["encoder_hidden_states"]["lang"].reshape(
        B, group, s["lang_chunk_len"], cfg.hidden_size)[:, :, 0]
    h_viz = fwd["encoder_hidden_states"]["viz"].reshape(
        B, group, s["viz_chunk_len"], cfg.hidden_size)[:, :, 0]

    # "easy" = PE index below 64; the pretraining dataloader's shuffle offset
    # determines whether shuffled frames count as easy (see
    # data/pretrain_loader.py shuffle_offset note; reference: modeling.py:635)
    is_easy = (shuffled_idx_img.reshape(B, group) < 64)

    labels = _allpairs_temporal_labels(video_src_ids.reshape(B, group), group)

    info: Dict[str, jnp.ndarray] = {}
    for name in ("lang_viz", "viz_viz"):
        xa = h_lang if name == "lang_viz" else h_viz
        logits = model.temporal_logits(xa, h_viz, which=name)   # [B*g*g, 4]

        easy_pair = is_easy[:, :, None] & is_easy[:, None]
        w = ((~easy_pair).astype(jnp.float32) * 0.99 + 0.01).reshape(-1)

        raw = cross_entropy_with_logits(logits, labels) * w
        info[f"{name}_loss"] = jnp.mean(raw)
        right = (jnp.argmax(logits, -1).astype(jnp.int32) == labels)
        info[f"{name}_acc"] = (jnp.sum(right.astype(jnp.float32) * w)
                               / (jnp.sum(w) + 1e-5))

    loss = info["lang_viz_loss"]
    if cfg.image_shuffle_prob > 0:
        loss = loss + info["viz_viz_loss"]
    info["loss"] = loss
    return loss * cfg.temporal_coef, info


class MerlotPretrainModel(nn.Module):
    """Forward + all three objectives; returns (total_loss, metrics, fwd).

    Expects a batch dict with:
      images          [img_batch*num_chunks, h, w, 3] float
      input_ids       [batch, num_chunks, L] int32
      shuffled_idx_img[batch*num_chunks] int32 (flat, like the reference loader)
      video_src_ids   [batch, num_chunks] int32
    """
    cfg: MerlotConfig

    def setup(self):
        self.model = MerlotModel(self.cfg, name="merlot")

    def __call__(self, batch: Dict[str, jnp.ndarray], *,
                 deterministic: bool = False,
                 collect_attention: str = "none",
                 attn_backend: str = "auto"):
        cfg = self.cfg
        # per-tower splits (the training default on TPU is now plain
        # 'pallas' in every tower — the backward's VMEM diet flipped the
        # joint tower, PERF.md round 3): 'vit_pallas' = pallas attention
        # in the ViT tower only; 'vitlang_pallas' additionally runs the
        # lang-only tower (colsum collect) on the kernel while the joint
        # tower stays XLA
        backend_vit = backend_lang = None
        if attn_backend == "vit_pallas":
            attn_backend, backend_vit = "auto", "pallas"
        elif attn_backend == "vitlang_pallas":
            attn_backend, backend_vit, backend_lang = "auto", "pallas", "pallas"
        fwd = self.model(
            batch["images"], batch["input_ids"], mask_input=True,
            shuffled_idx_img=batch["shuffled_idx_img"],
            collect_attention=collect_attention,
            deterministic=deterministic, attn_backend=attn_backend,
            attn_backend_vit=backend_vit, attn_backend_lang=backend_lang)

        lang_l, lang_m = mask_loss(self.model, fwd)
        contr_l, contr_m = contrastive_loss(self.model, fwd, cfg)
        if cfg.temporal_coef > 0.0:
            temp_l, temp_m = temporal_loss(self.model, fwd, cfg,
                                           batch["shuffled_idx_img"],
                                           batch["video_src_ids"])
        else:
            temp_l, temp_m = 0.0, {}

        metrics = {f"lang/{k}": v for k, v in lang_m.items()}
        metrics.update({f"contr/{k}": v for k, v in contr_m.items()})
        metrics.update({f"temporal/{k}": v for k, v in temp_m.items()})
        if "attention_log" in fwd:
            metrics.update({f"attn/{k}": v for k, v in fwd["attention_log"].items()})

        loss = lang_l + contr_l + temp_l
        return loss, metrics, fwd

    def debug_forward(self, batch: Dict[str, jnp.ndarray]):
        """PREDICT-mode debug export (reference: model/modeling.py:759-787):
        full forward with telemetry attention maps, the joint encoder's
        head-meaned probs, lang-tower masked ids, and every scalar loss —
        for offline inspection of a training batch."""
        loss, metrics, fwd = self(batch, deterministic=True,
                                  collect_attention="probs",
                                  attn_backend="xla")
        return {
            "loss": loss,
            "metrics": metrics,
            "masked_ids": fwd["lang_mask_info"]["masked_ids"],
            "masked_idx": fwd["lang_mask_info"]["masked_idx"],
            "encoder_hidden_states": fwd["encoder_hidden_states"],
        }
