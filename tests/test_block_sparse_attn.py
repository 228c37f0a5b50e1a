"""disable_pairwise_lang_attn: lang chunks must not attend across segments
while vision attends (and is attended by) everything
(reference: model/modeling.py:160-168)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.merlot import MerlotModel
from merlot_tpu.tools.grover_data import (classification_batches,
                                          write_classification_shard)

CFG = MerlotConfig(
    hidden_size=32, vocab_size=300, num_hidden_layers=1,
    num_attention_heads=2, intermediate_size=64, image_size=(32, 32),
    patch_size=16, spatial_pool_size=1, use_bfloat16=False,
    num_vision_transformer_hidden_layers=1,
    num_lang_transformer_hidden_layers=1, num_chunks_in_group=2,
    hidden_dropout_prob=0.0, disable_pairwise_lang_attn=True)


def _apply(cfg, perturb_chunk=None):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(100, 300, (2, 2, 6)).astype(np.int32)
    if perturb_chunk is not None:
        ids[:, perturb_chunk] = rng.integers(100, 300, (2, 6))
    model = MerlotModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(images),
                           jnp.asarray(ids))
    return model.apply(variables, jnp.asarray(images), jnp.asarray(ids))


def test_block_sparse_lang_attention():
    base = _apply(CFG)
    pert = _apply(CFG, perturb_chunk=1)
    lang0 = np.asarray(base["encoder_hidden_states"]["lang"])[:, :6]
    lang0_p = np.asarray(pert["encoder_hidden_states"]["lang"])[:, :6]
    # with ONE joint layer, chunk-0 lang states see chunk-1 lang only through
    # direct attention — which the block mask forbids; vision is identical
    # (images unchanged), so chunk-0 outputs must be identical
    np.testing.assert_allclose(lang0, lang0_p, rtol=1e-5, atol=1e-5)

    # control: with pairwise attention ENABLED chunk-0 outputs must change
    import dataclasses
    cfg_open = dataclasses.replace(CFG, disable_pairwise_lang_attn=False)
    base2 = _apply(cfg_open)
    pert2 = _apply(cfg_open, perturb_chunk=1)
    l0 = np.asarray(base2["encoder_hidden_states"]["lang"])[:, :6]
    l0p = np.asarray(pert2["encoder_hidden_states"]["lang"])[:, :6]
    assert not np.allclose(l0, l0p, rtol=1e-5, atol=1e-5)


def test_grover_classification_loader(tmp_path, rng):
    shard = str(tmp_path / "cls.tfrecord")
    seqs = [list(rng.integers(1, 200, 10)) for _ in range(4)]
    labels = [0, 1, 1, 0]
    n = write_classification_shard(shard, seqs, labels, seq_length=16)
    assert n == 4
    b = next(classification_batches([shard], 16, 4, is_training=False,
                                    repeat=False))
    assert b["input_ids"].shape == (4, 16)
    assert list(b["label_ids"]) == labels
    assert (b["is_real_example"] == 1).all()

    # pooled_hidden grabs the first clf-token position
    from merlot_tpu.models.grover import pooled_hidden
    hidden = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    ids = jnp.asarray([[7, 1, 99, 1, 2], [3, 4, 5, 99, 2]], jnp.int32)
    pooled = np.asarray(pooled_hidden(hidden, ids, clf_token=99))
    np.testing.assert_allclose(pooled[0], np.asarray(hidden)[0, 2])
    np.testing.assert_allclose(pooled[1], np.asarray(hidden)[1, 3])
