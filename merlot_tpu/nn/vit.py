"""Vision backbone: ViT with an optional weight-standardized LiteResNet stem.

Parity target: utils/vision_transformer.py (reference).
  * hybrid stem = 3-conv stem (stride-2 then 2x2 avg-pool) + bottleneck
    block-groups that downsample by **avg-pool instead of strided conv**,
    GroupNorm(32, eps 1e-4) instead of BatchNorm, weight standardization
    (reference: vision_transformer.py:118-170).
  * 2 zero-initialized CLS slots prepended (CLS#0 feeds the joint encoder,
    CLS#1 is the contrastive target; reference: :183,231).
  * learned 2-D grid position table [max_nimg, 64, 64, D] sliced to the
    actual grid (reference: utils/model_utils.py:710-739).
  * patches are LN'd in fp32 then run through the ViT in bf16; the 2x2
    spatial avg-pool shrinks the grid before the joint encoder
    (reference: :255-267).

All convs run NHWC in bf16 on the MXU; no input transposition (the
reference's [H,W,3,B] ``transpose_input`` hack is a TF1-era workaround that
XLA does not need).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from merlot_tpu.nn.layers import (GroupNorm, LayerNorm, WSConv,
                                  avg_pool_same, avg_pool_valid, trunc_normal)
from merlot_tpu.nn.transformer import TransformerEncoder, TransformerHParams

Dtype = Any


class PositionEmbedder2D(nn.Module):
    """[max_nimg, 64, 64, D] grid PE + per-image CLS PE, sliced and flattened.

    Returns [num_img * (num_cls_emb + num_h*num_w), D] fp32
    (reference: utils/model_utils.py:710-739).
    """
    embedding_size: int
    max_nimg: int = 1
    max_position_embeddings: int = 64
    num_cls_emb: int = 1
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, num_h: int, num_w: int, num_img: int = 1) -> jnp.ndarray:
        m = self.max_position_embeddings
        pos3d = self.param("pos_embs", trunc_normal(self.initializer_range),
                           (self.max_nimg, m, m, self.embedding_size), jnp.float32)
        grid = pos3d[:num_img, :num_h, :num_w].reshape(
            num_img, num_h * num_w, self.embedding_size)
        if self.num_cls_emb > 0:
            cls = self.param("cls_emb", trunc_normal(self.initializer_range),
                             (self.max_nimg, self.num_cls_emb, self.embedding_size),
                             jnp.float32)
            grid = jnp.concatenate([cls[:num_img], grid], axis=1)
        return grid.reshape(num_img * (self.num_cls_emb + num_h * num_w),
                            self.embedding_size)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> (avgpool if downsampling) -> 1x1, GN+relu, avg-pool shortcut."""
    filters: int
    strides: int = 1
    use_projection: bool = False
    dtype: Dtype = jnp.bfloat16
    gn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gn = self.gn_backend
        shortcut = x
        if self.use_projection:
            s = avg_pool_same(x, self.strides, self.strides) if self.strides > 1 else x
            s = WSConv(4 * self.filters, 1, dtype=self.dtype, name="proj_conv")(s)
            shortcut = GroupNorm(name="proj_gn")(s, backend=gn)

        y = WSConv(self.filters, 1, dtype=self.dtype, name="conv1")(x)
        y = GroupNorm(name="gn1")(y, relu=True, backend=gn)
        y = WSConv(self.filters, 3, dtype=self.dtype, name="conv2")(y)
        y = GroupNorm(name="gn2")(y, relu=True, backend=gn)
        if self.strides > 1:
            y = avg_pool_same(y, self.strides, self.strides)
        y = WSConv(4 * self.filters, 1, dtype=self.dtype, name="conv3")(y)
        return GroupNorm(name="gn3")(y, residual=shortcut, relu=True, backend=gn)


class LiteResNet(nn.Module):
    """The reference's "lite resnet50": 3-conv stem + N bottleneck groups.

    Total downsampling = 4 * 2^(len(layers)-1); for layers=[3,4,9] that is
    /16, matching patch_size 16 (reference: vision_transformer.py:208).
    """
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Dtype = jnp.bfloat16
    gn_backend: Optional[str] = None
    # run the RGB stem conv as a stride-1 2x2 conv over the s2d(2) input
    # (mathematically identical, MXU-friendlier contraction; see
    # layers.WSConv.space_to_depth). Param tree/checkpoints unchanged.
    stem_space_to_depth: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.width
        gn = self.gn_backend
        x = WSConv(w // 2, 3, strides=2, dtype=self.dtype,
                   space_to_depth=self.stem_space_to_depth,
                   name="stem_conv0")(x)
        x = GroupNorm(name="stem_gn0")(x, relu=True, backend=gn)
        x = WSConv(w // 2, 3, strides=1, dtype=self.dtype, name="stem_conv1")(x)
        x = GroupNorm(name="stem_gn1")(x, relu=True, backend=gn)
        x = WSConv(w, 3, strides=1, dtype=self.dtype, name="stem_conv2")(x)
        x = GroupNorm(name="stem_gn2")(x, relu=True, backend=gn)
        x = avg_pool_same(x, 2, 2)

        for i, blocks in enumerate(self.layers):
            filters = w * (2 ** i)
            strides = 1 if i == 0 else 2
            x = BottleneckBlock(filters, strides, use_projection=True, dtype=self.dtype,
                                gn_backend=gn, name=f"group{i + 1}_block0")(x)
            for b in range(1, blocks):
                x = BottleneckBlock(filters, 1, dtype=self.dtype, gn_backend=gn,
                                    name=f"group{i + 1}_block{b}")(x)
        return x


class VisionBackbone(nn.Module):
    """ViT over one frame; returns CLS states and the pooled grid sequence.

    Output dict:
      cls   [B*, num_cls_emb, H]  (compute dtype; caller casts to fp32)
      seq   [B*, num_h*num_w, H]  (2x2-pooled grid)
      num_h, num_w (static ints)
    """
    patch_size: int = 16
    hidden_size: int = 768
    num_cls_emb: int = 2
    resnet_layers: Sequence[int] = ()
    spatial_pool_size: int = 2
    vit_hp: TransformerHParams = TransformerHParams()
    initializer_range: float = 0.02
    dtype: Dtype = jnp.bfloat16
    stem_space_to_depth: bool = False  # see LiteResNet.stem_space_to_depth

    @nn.compact
    def __call__(self, image: jnp.ndarray, *, deterministic: bool = True,
                 attn_backend: str = "auto") -> Dict[str, Any]:
        p = self.patch_size
        b, h0, w0, _ = image.shape
        assert h0 % p == 0 and w0 % p == 0, (h0, w0, p)

        if image.dtype == jnp.uint8:
            # uint8 infeed fast path (loader: device_put_iterator
            # images_u8): pixels were quantized to 1/255 steps on the host
            # to halve infeed bytes vs bf16; dequantize in fp32 before the
            # usual compute-dtype cast (quantization error <= 1/510/pixel,
            # comparable to the bf16 rounding the default path already has)
            image = image.astype(jnp.float32) * (1.0 / 255.0)
        img_norm = (image.astype(self.dtype) - jnp.asarray(0.5, self.dtype))
        if len(self.resnet_layers) == 0:
            # plain PxP patchify conv
            x = WSConv(self.hidden_size, p, strides=p, weight_standardization=False,
                       use_bias=True, padding="VALID", dtype=self.dtype,
                       name="patch_conv")(img_norm)
        else:
            assert p == 16, "hybrid ResNet stem downsamples by exactly 16"
            # GN backend is chosen per path (forward-only vs training);
            # both default to unfused XLA — the fused kernel measured
            # slower on-chip at MERLOT's shapes (ops/pallas_groupnorm.py)
            from merlot_tpu.ops import pallas_groupnorm
            gn = (pallas_groupnorm.BACKEND if deterministic
                  else pallas_groupnorm.TRAIN_BACKEND)
            c = LiteResNet(tuple(self.resnet_layers), width=64, dtype=self.dtype,
                           gn_backend=gn,
                           stem_space_to_depth=self.stem_space_to_depth,
                           name="resnet")(img_norm)
            x = WSConv(self.hidden_size, 1, weight_standardization=False,
                       use_bias=True, dtype=self.dtype, name="post_resnet_proj")(c)

        h1, w1 = h0 // p, w0 // p
        x = x.reshape(b, h1 * w1, self.hidden_size).astype(jnp.float32)
        x = jnp.concatenate(
            [jnp.zeros((b, self.num_cls_emb, self.hidden_size), jnp.float32), x], axis=1)

        pos = PositionEmbedder2D(self.hidden_size, max_nimg=1,
                                 num_cls_emb=self.num_cls_emb,
                                 initializer_range=self.initializer_range,
                                 name="pos_emb2d")(h1, w1, 1)
        x = LayerNorm(name="patches_pre_ln")(x + pos[None])

        info = TransformerEncoder(self.vit_hp, name="encoder")(
            x.astype(self.dtype), None, deterministic=deterministic,
            attn_backend=attn_backend)
        hidden = info["hidden_state"]

        cls = hidden[:, :self.num_cls_emb]
        seq = hidden[:, self.num_cls_emb:]

        sp = self.spatial_pool_size
        if sp > 1:
            grid = seq.reshape(b, h1, w1, self.hidden_size)
            grid = avg_pool_valid(grid, sp, sp)
            h2, w2 = h1 // sp, w1 // sp
            seq = grid.reshape(b, h2 * w2, self.hidden_size)
        else:
            h2, w2 = h1, w1

        return {"cls": cls, "seq": seq, "num_h": h2, "num_w": w2}
