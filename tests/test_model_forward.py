"""MerlotModel forward-pass shape/consistency tests on tiny configs.

Everything is jitted — eager dispatch on this 1-core CPU host is ~2s/op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.merlot import MerlotModel
from merlot_tpu.models.pretrain import MerlotPretrainModel

TINY = MerlotConfig(
    hidden_size=64, vocab_size=400, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=128, image_size=(32, 64), patch_size=16,
    spatial_pool_size=2, resnet_layers=(), num_cls_emb=2,
    num_vision_transformer_hidden_layers=2,
    num_lang_transformer_hidden_layers=2,
    num_chunks_in_group=2, use_bfloat16=False,
    hidden_dropout_prob=0.0, do_projection=True, do_bias=True,
    contrast_coef=0.25, image_shuffle_prob=0.4,
)
# 32x64 / 16 = 2x4 grid -> pool 2 -> 1x2 = 2 patches + 1 cls = 3 viz tokens


def _batch(rng, cfg, batch=2, num_chunks=4, L=8):
    h, w = cfg.image_size
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (batch * num_chunks, h, w, 3)),
                              jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(100, cfg.vocab_size, (batch, num_chunks, L)), jnp.int32),
        "shuffled_idx_img": jnp.asarray(
            np.tile(np.arange(cfg.num_chunks_in_group), batch * num_chunks
                    // cfg.num_chunks_in_group), jnp.int32),
        "video_src_ids": jnp.asarray(
            np.repeat(np.arange(batch * 2), 2).reshape(batch, num_chunks), jnp.int32),
    }


def _init_and_apply(model, b):
    init = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        b["images"], b["input_ids"], mask_input=True,
        shuffled_idx_img=b["shuffled_idx_img"]))
    variables = init(b)
    apply = jax.jit(lambda v, b, k: model.apply(
        v, b["images"], b["input_ids"], mask_input=True,
        shuffled_idx_img=b["shuffled_idx_img"], rngs={"masking": k}))
    return variables, apply


def test_forward_shapes(rng):
    cfg = TINY
    b = _batch(rng, cfg)
    model = MerlotModel(cfg)
    variables, apply = _init_and_apply(model, b)
    out = apply(variables, b, jax.random.PRNGKey(2))

    s = out["shapes"]
    assert s["B"] == 2 * 4 // 2 and s["L"] == 16
    assert s["viz_chunk_len"] == 3 and s["P"] == 6
    assert out["encoder_hidden_states"]["viz"].shape == (4, 6, 64)
    assert out["encoder_hidden_states"]["lang"].shape == (4, 16, 64)
    assert out["img_trg_h"].shape == (8, 64)
    assert out["lang_trg_h"].shape == (8, 64)
    assert out["lang_mask_info"]["masked_ids"].shape == (4, 16)
    # masked_idx count = int(L * masking_rate)
    assert out["lang_mask_info"]["masked_idx"].shape == (4, int(16 * 0.2))
    for v in jax.tree.leaves(out):
        assert np.all(np.isfinite(np.asarray(v, np.float32)))


def test_pretrain_losses_finite(rng):
    cfg = TINY
    b = _batch(rng, cfg)
    model = MerlotPretrainModel(cfg)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        b, deterministic=True))(b)
    loss, metrics, _ = jax.jit(lambda v, b, k: model.apply(
        v, b, deterministic=True, rngs={"masking": k}))(
        variables, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    for k in ("lang/loss", "lang/acc", "contr/loss_all", "contr/lang_to_viz",
              "temporal/lang_viz_loss", "temporal/viz_viz_acc"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # untrained accuracy should be near-chance
    assert float(metrics["lang/acc"]) < 0.2
    # chance-level MLM CE is ln(vocab)
    assert abs(float(metrics["lang/loss"]) - np.log(cfg.vocab_size)) < 1.0


def test_forward_2d_input_ids_and_num_texts(rng):
    """VCR-style: 2-D ids, num_texts=4, image features tiled across texts."""
    cfg = MerlotConfig(
        hidden_size=64, vocab_size=400, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, image_size=(32, 64), patch_size=16,
        spatial_pool_size=2, num_cls_emb=2, use_bfloat16=False,
        num_vision_transformer_hidden_layers=2, hidden_dropout_prob=0.0,
        num_texts=4)
    n_img, text_batch, L = 2, 8, 12
    images = jnp.asarray(rng.uniform(0, 1, (n_img, 32, 64, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(100, 400, (text_batch, L)), jnp.int32)
    model = MerlotModel(cfg)
    variables = jax.jit(lambda i, t: model.init(jax.random.PRNGKey(0), i, t))(
        images, ids)
    out = jax.jit(lambda v, i, t: model.apply(v, i, t))(variables, images, ids)
    assert out["encoder_hidden_states"]["lang"].shape == (8, 12, 64)
    assert out["encoder_hidden_states"]["viz"].shape == (8, 3, 64)
    lang = np.asarray(out["encoder_hidden_states"]["lang"])
    assert not np.allclose(lang[0], lang[1])


def test_masking_determinism_and_rate(rng):
    cfg = TINY
    b = _batch(rng, cfg)
    model = MerlotModel(cfg)
    variables, apply = _init_and_apply(model, b)

    o1 = apply(variables, b, jax.random.PRNGKey(7))
    o2 = apply(variables, b, jax.random.PRNGKey(7))
    o3 = apply(variables, b, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(o1["lang_mask_info"]["masked_ids"]),
                                  np.asarray(o2["lang_mask_info"]["masked_ids"]))
    assert not np.array_equal(np.asarray(o1["lang_mask_info"]["masked_idx"]),
                              np.asarray(o3["lang_mask_info"]["masked_idx"]))
    # masked ids differ from originals somewhere, and only at legal positions
    orig = np.asarray(b["input_ids"]).reshape(4, 16)
    masked = np.asarray(o1["lang_mask_info"]["masked_ids"])
    assert (masked != orig).any()
    assert ((masked == orig) | (masked == 1) | (masked >= 100)).all()


def test_uint8_image_infeed_matches_float(rng):
    """uint8 infeed fast path (device_put_iterator images_u8): the backbone
    dequantizes x/255 on device; outputs must match the float path fed the
    SAME quantized values exactly (the only difference is where /255 runs),
    and be close to unquantized floats."""
    from merlot_tpu.nn.transformer import TransformerHParams
    from merlot_tpu.nn.vit import VisionBackbone

    hp = TransformerHParams(hidden_size=32, num_heads=2, num_layers=2,
                            intermediate_size=64, dtype=jnp.float32)
    vb = VisionBackbone(patch_size=16, hidden_size=32, num_cls_emb=2,
                        resnet_layers=(), spatial_pool_size=2,
                        vit_hp=hp, dtype=jnp.float32)
    imgs = rng.uniform(0, 1, (2, 32, 64, 3))
    u8 = np.clip(np.round(imgs * 255.0), 0, 255).astype(np.uint8)

    v = jax.jit(lambda x: vb.init(jax.random.PRNGKey(0), x))(
        jnp.asarray(imgs, jnp.float32))
    run = jax.jit(lambda v, x: vb.apply(v, x)["seq"])
    out_u8 = run(v, jnp.asarray(u8))
    out_fq = run(v, jnp.asarray(u8.astype(np.float32) / 255.0))
    out_f = run(v, jnp.asarray(imgs, jnp.float32))
    np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_fq),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_u8), np.asarray(out_f),
                               rtol=0.05, atol=0.05)
