"""Checkpoint-converter name map: target paths must cover our real param
trees exactly, and a synthetic TF checkpoint must round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.grover import GroverConfig, GroverLM
from merlot_tpu.models.pretrain import MerlotPretrainModel
from merlot_tpu.tools.convert_tf_checkpoint import (convert_arrays,
                                                    grover_tf_name_map,
                                                    merlot_tf_name_map,
                                                    stack_for_scan)

CFG = MerlotConfig(
    hidden_size=64, vocab_size=400, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128, image_size=(64, 96),
    patch_size=16, spatial_pool_size=2, resnet_layers=(1, 2, 1),
    num_vision_transformer_hidden_layers=2,
    num_lang_transformer_hidden_layers=2, num_chunks_in_group=2,
    use_bfloat16=False, hidden_dropout_prob=0.0,
    do_projection=True, do_bias=True, image_shuffle_prob=0.4)


def _param_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out |= _param_paths(v, path)
        else:
            out.add(path)
    return out


def _init_pretrain_params(cfg):
    model = MerlotPretrainModel(cfg)
    rng = np.random.default_rng(0)
    b = {
        "images": jnp.asarray(rng.uniform(0, 1, (4, 64, 96, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(100, 400, (2, 2, 8)), jnp.int32),
        "shuffled_idx_img": jnp.asarray([0, 1, 0, 1], jnp.int32),
        "video_src_ids": jnp.zeros((2, 2), jnp.int32),
    }
    v = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        b, deterministic=True))(b)
    return v["params"]


def test_merlot_name_map_is_exact_cover():
    params = _init_pretrain_params(CFG)
    ours = _param_paths(params)
    mapped = set(merlot_tf_name_map(CFG).values())
    assert mapped == ours, (
        f"missing from map: {sorted(ours - mapped)[:5]} | "
        f"extra in map: {sorted(mapped - ours)[:5]}")
    # TF names unique too (bijection)
    m = merlot_tf_name_map(CFG)
    assert len(set(m.keys())) == len(m) == len(set(m.values()))


def test_grover_name_map_is_exact_cover():
    cfg = GroverConfig(vocab_size=300, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=32)
    model = GroverLM(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
    ours = _param_paths(v["params"])
    mapped = set(grover_tf_name_map(cfg.num_hidden_layers).values())
    assert mapped == ours


def test_convert_synthetic_tf_checkpoint(tmp_path):
    """Write a real TF checkpoint with the reference's names and shapes,
    convert it, and confirm every leaf lands with correct values."""
    tf = pytest.importorskip("tensorflow")
    params = _init_pretrain_params(CFG)
    name_map = merlot_tf_name_map(CFG)

    # fabricate TF variables matching our shapes, with recognizable values
    flat_ours = {}
    def flatten(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                flatten(v, path)
            else:
                flat_ours[path] = v
    flatten(params)

    tf_vars = {}
    rng = np.random.default_rng(1)
    for tf_name, our_path in name_map.items():
        shape = np.shape(flat_ours[our_path])
        tf_vars[tf_name] = rng.standard_normal(shape).astype(np.float32)

    ckpt_prefix = str(tmp_path / "model.ckpt")
    with tf.compat.v1.Graph().as_default():
        variables = [tf.compat.v1.get_variable(
            name, initializer=tf.constant(val))
            for name, val in tf_vars.items()]
        saver = tf.compat.v1.train.Saver(variables)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt_prefix)

    from merlot_tpu.tools.convert_tf_checkpoint import load_tf_checkpoint_arrays
    arrays = load_tf_checkpoint_arrays(ckpt_prefix)
    converted = convert_arrays(arrays, name_map, params_template=params,
                               verbose=False)

    flat_conv = {}
    def flatten2(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                flatten2(v, path)
            else:
                flat_conv[path] = v
    flatten2(converted)

    for tf_name, our_path in name_map.items():
        np.testing.assert_allclose(np.asarray(flat_conv[our_path], np.float32),
                                   tf_vars[tf_name], rtol=1e-6,
                                   err_msg=our_path)


def test_stack_for_scan():
    params = _init_pretrain_params(CFG)
    stacked = stack_for_scan(jax.tree.map(lambda x: x, params),
                             "merlot/encoder", 2)
    k = stacked["merlot"]["encoder"]["layers"]["layer"]["attention"]["query"]["kernel"]
    assert k.shape == (2, 64, 64)
    assert "layer00" not in stacked["merlot"]["encoder"]
