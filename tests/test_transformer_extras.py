"""Generic transformer surface: cross-attention, KV cache, mask utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.nn.transformer import TransformerEncoder, TransformerHParams
from merlot_tpu.ops.masks import (ltr_attention_mask, one_hot_gather,
                                  unilm_attention_mask)

HP = TransformerHParams(hidden_size=32, num_layers=2, num_heads=2,
                        intermediate_size=64, hidden_dropout_prob=0.0,
                        dtype=jnp.float32)


def test_one_hot_gather(rng):
    table = jnp.asarray(rng.standard_normal((10, 8)), jnp.float32)
    idx = jnp.asarray([3, 0, 9], jnp.int32)
    np.testing.assert_allclose(np.asarray(one_hot_gather(table, idx)),
                               np.asarray(table)[[3, 0, 9]], rtol=1e-6)


def test_ltr_mask_with_cache_prefix():
    m = np.asarray(ltr_attention_mask(3, 5))
    # 2 cached positions: row i attends keys <= i + 2
    want = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 0], [1, 1, 1, 1, 1]],
                    np.float32)
    np.testing.assert_array_equal(m, want)


def test_unilm_mask():
    bidi = jnp.asarray([[1, 1, 0, 0]], jnp.float32)
    m = np.asarray(unilm_attention_mask(bidi))[0]
    assert m[0, 1] == 1.0   # forward into bidirectional zone allowed
    assert m[0, 2] == 0.0   # forward into causal zone blocked
    assert m[3, 2] == 1.0   # backward always allowed
    pad = jnp.asarray([[0, 0, 0, 1]], bool)
    m2 = np.asarray(unilm_attention_mask(bidi, pad))[0]
    assert m2[3, 3] == 0.0  # padding key excluded


def test_cross_attention_runs_and_depends_on_encoder(rng):
    enc = TransformerEncoder(HP)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    x_enc = jnp.asarray(rng.standard_normal((2, 9, 32)), jnp.float32)
    mask = jnp.ones((2, 5, 9), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), x, mask, x_enc=x_enc)
    o1 = enc.apply(v, x, mask, x_enc=x_enc)["hidden_state"]
    o2 = enc.apply(v, x, mask, x_enc=x_enc * 2.0)["hidden_state"]
    assert o1.shape == (2, 5, 32)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_encoder_cache_decode_matches_full(rng):
    """Causal decode through the generic encoder cache == full forward."""
    enc = TransformerEncoder(HP)
    b, s, max_len = 2, 6, 8
    x = jnp.asarray(rng.standard_normal((b, s, 32)), jnp.float32)
    causal = jnp.tril(jnp.ones((s, s)))[None].astype(jnp.float32)
    causal = jnp.broadcast_to(causal, (b, s, s))
    v = enc.init(jax.random.PRNGKey(0), x, causal)
    full = enc.apply(v, x, causal)["hidden_state"]

    cache = enc.init_cache(b, max_len)
    outs = []
    for t in range(s):
        step_mask = (jnp.arange(max_len)[None, None] <= t).astype(jnp.float32)
        step_mask = jnp.broadcast_to(step_mask, (b, 1, max_len))
        o = enc.apply(v, x[:, t:t + 1], step_mask, cache=cache, cache_pos=t)
        cache = o["new_cache"]
        outs.append(o["hidden_state"][:, 0])
    decoded = np.stack([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(decoded, np.asarray(full), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("remat", [False, True])
def test_bias_mask_path_matches_multiplicative(rng, remat):
    """Regression: the unrolled loop must forward mask_format to the layers.

    The encoder pre-converts the validity mask to an additive bias on the
    collect='none' path (transformer.py) but keeps the multiply form on the
    colsum path; the hidden states must nonetheless be identical. Round-1 bug:
    the unrolled call sites dropped mask_format, so the bias (0/-1e10) was
    applied multiplicatively and every valid logit collapsed to -1e10
    (uniform attention). Needs non-tiny weights to be visible, hence
    initializer_range=0.5.
    """
    hp = TransformerHParams(hidden_size=32, num_layers=2, num_heads=2,
                            intermediate_size=64, hidden_dropout_prob=0.0,
                            initializer_range=0.5, dtype=jnp.float32,
                            remat=remat)
    enc = TransformerEncoder(hp)
    x = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    mask = jnp.asarray(rng.random((2, 6, 6)) < 0.6, jnp.float32)
    mask = jnp.maximum(mask, jnp.eye(6)[None])  # keep every row non-empty
    v = enc.init(jax.random.PRNGKey(1), x, mask)
    h_bias = enc.apply(v, x, mask, collect="none")["hidden_state"]
    h_mult = enc.apply(v, x, mask, collect="colsum")["hidden_state"]
    np.testing.assert_allclose(np.asarray(h_bias), np.asarray(h_mult),
                               rtol=1e-5, atol=1e-5)


def test_loader_unbatch_path(tmp_path):
    from merlot_tpu.data.make_synthetic_tfrecord import write_synthetic_shard
    from merlot_tpu.data.pretrain_loader import PretrainLoader
    shard = str(tmp_path / "x.tfrecord")
    write_synthetic_shard(shard, num_examples=2, num_chunks=8, img_hw=(48, 64))
    cfg = {"num_chunks": 8, "image_size": [32, 48], "chunk_text_len": 8,
           "num_chunks_in_group": 2, "image_shuffle_prob": 0.5,
           "unbatch_size": 2, "shuffle_chunks": False}
    loader = PretrainLoader([shard], cfg, batch_size=1, num_threads=1,
                            shuffle_buffer=0, seed=0, repeat=False)
    batches = list(loader)
    # 2 source examples of 8 chunks -> 4 independent 4-chunk examples,
    # emitted at the configured batch_size (reference unbatch semantics,
    # model/dataloader.py:190-207: batch size is NOT multiplied)
    assert len(batches) == 4
    for b in batches:
        assert b["input_ids"].shape == (1, 4, 8)
        assert b["images"].shape == (4, 32, 48, 3)


def test_fused_qkv_matches_unfused(rng):
    """fused_qkv concatenates the q/k/v kernels into one [H, 3H] matmul;
    every output column is the same dot product, so hidden states must be
    bit-identical and the param tree unchanged."""
    import dataclasses
    x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    mask = jnp.ones((2, 5, 5), jnp.float32)
    enc = TransformerEncoder(HP)
    v = enc.init(jax.random.PRNGKey(0), x, mask)
    enc_f = TransformerEncoder(dataclasses.replace(HP, fused_qkv=True))
    # same params load unchanged into the fused module
    o = np.asarray(enc.apply(v, x, mask)["hidden_state"])
    o_f = np.asarray(enc_f.apply(v, x, mask)["hidden_state"])
    np.testing.assert_array_equal(o, o_f)
    # init under the fused path produces the identical tree
    v_f = enc_f.init(jax.random.PRNGKey(0), x, mask)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v_f)


def test_fused_qkv_params_canonical_tree(rng):
    """fused_qkv_params stores ONE attention/qkv param per attention; a
    split tree fused by the boundary transform reproduces the split
    model's hidden states bit-identically, and the transforms round-trip
    bitwise (both plain and scan-stacked layouts)."""
    import dataclasses
    from merlot_tpu.train.checkpoint import (fuse_qkv_tree,
                                             tree_has_fused_qkv,
                                             unfuse_qkv_tree)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    mask = jnp.ones((2, 5, 5), jnp.float32)
    enc = TransformerEncoder(HP)
    v = enc.init(jax.random.PRNGKey(0), x, mask)
    enc_c = TransformerEncoder(dataclasses.replace(HP, fused_qkv_params=True))
    v_c = jax.tree.map(np.asarray, fuse_qkv_tree(jax.tree.map(np.asarray, v)))
    assert tree_has_fused_qkv(v_c) and not tree_has_fused_qkv(v)
    o = np.asarray(enc.apply(v, x, mask)["hidden_state"])
    o_c = np.asarray(enc_c.apply(v_c, x, mask)["hidden_state"])
    np.testing.assert_array_equal(o, o_c)

    # the fused init builds the same tree structure the transform does
    v_init = enc_c.init(jax.random.PRNGKey(0), x, mask)
    assert (jax.tree_util.tree_structure(jax.tree.map(np.asarray, v_init))
            == jax.tree_util.tree_structure(v_c))

    # round-trips are bitwise
    back = unfuse_qkv_tree(v_c)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.tree.map(np.asarray, v))[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # scan-stacked layout: leading layer axis, concat still on the last
    hp_s = dataclasses.replace(HP, scan_layers=True)
    v_s = TransformerEncoder(hp_s).init(jax.random.PRNGKey(0), x, mask)
    v_s = jax.tree.map(np.asarray, v_s)
    v_sf = fuse_qkv_tree(v_s)
    enc_sf = TransformerEncoder(dataclasses.replace(
        hp_s, fused_qkv_params=True))
    o_s = np.asarray(TransformerEncoder(hp_s).apply(v_s, x, mask)["hidden_state"])
    o_sf = np.asarray(enc_sf.apply(v_sf, x, mask)["hidden_state"])
    np.testing.assert_array_equal(o_s, o_sf)


def test_fused_qkv_params_checkpoint_boundary(rng, tmp_path):
    """Checkpoints written by a fused_qkv_params run are reference-split
    ON DISK (a split model restores them directly); restoring into a
    fused template concats back bitwise. VERDICT r4 #1."""
    import dataclasses
    from merlot_tpu.train.checkpoint import (CheckpointManager,
                                             tree_has_fused_qkv)
    x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    mask = jnp.ones((2, 5, 5), jnp.float32)
    enc_c = TransformerEncoder(dataclasses.replace(HP, fused_qkv_params=True))
    v_c = jax.tree.map(np.asarray, enc_c.init(jax.random.PRNGKey(3), x, mask))

    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(7, {"params": v_c["params"]})

    raw = mgr.restore(7)  # no template: the literal on-disk tree
    assert not tree_has_fused_qkv(raw)
    enc_split = TransformerEncoder(HP)
    o_split = np.asarray(enc_split.apply(
        {"params": raw["params"]}, x, mask)["hidden_state"])

    got = mgr.restore(7, {"params": v_c["params"]})
    assert tree_has_fused_qkv(got)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(v_c["params"])[0],
            jax.tree_util.tree_flatten_with_path(got["params"])[0]):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    o_fused = np.asarray(enc_c.apply(
        {"params": got["params"]}, x, mask)["hidden_state"])
    np.testing.assert_array_equal(o_split, o_fused)
