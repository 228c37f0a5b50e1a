"""scan-over-layers execution mode + mesh sharding rules."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.pretrain import MerlotPretrainModel
from merlot_tpu.nn.transformer import TransformerEncoder, TransformerHParams
from merlot_tpu.parallel.mesh import (make_mesh, param_partition_spec,
                                      shard_params)

HP = TransformerHParams(hidden_size=32, num_layers=3, num_heads=2,
                        intermediate_size=64, hidden_dropout_prob=0.0,
                        dtype=jnp.float32)


def _run(hp, x, mask, collect="none"):
    enc = TransformerEncoder(hp)
    v = jax.jit(lambda x, m: enc.init(jax.random.PRNGKey(0), x, m,
                                      collect=collect))(x, mask)
    out = jax.jit(lambda v, x, m: enc.apply(v, x, m, collect=collect))(v, x, mask)
    return v, out


def test_scan_runs_and_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 32)), jnp.float32)
    mask = jnp.ones((2, 6, 6), jnp.float32)

    v, out = _run(dataclasses.replace(HP, scan_layers=True), x, mask, "colsum")
    assert out["hidden_state"].shape == (2, 6, 32)
    assert out["attn_colsum"].shape == (2, 6)
    # stacked layer params: leading axis = num_layers
    k = v["params"]["layers"]["layer"]["attention"]["query"]["kernel"]
    assert k.shape == (3, 32, 32)
    assert np.isfinite(np.asarray(out["hidden_state"])).all()


def test_scan_matches_unrolled_with_same_params(rng):
    """Restack unrolled params into scan layout -> outputs must be equal."""
    x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    mask = jnp.ones((2, 5, 5), jnp.float32)
    v_unroll, out_unroll = _run(HP, x, mask, "colsum")

    # build scan params by stacking layer00..02
    p = v_unroll["params"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[p[f"layer{i:02d}"] for i in range(3)])
    v_scan = {"params": {"layers": {"layer": stacked},
                         "final_ln": p["final_ln"]}}
    enc = TransformerEncoder(dataclasses.replace(HP, scan_layers=True))
    out_scan = jax.jit(lambda v, x, m: enc.apply(v, x, m, collect="colsum"))(
        v_scan, x, mask)
    np.testing.assert_allclose(np.asarray(out_scan["hidden_state"]),
                               np.asarray(out_unroll["hidden_state"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_scan["attn_colsum"]),
                               np.asarray(out_unroll["attn_colsum"]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_scan_prefix_depth_matches_unrolled(rng, remat):
    """Prefix runs (num_layers < stack depth — the shared-but-shallower lang
    tower, reference model/modeling.py:361-371) must work in scan mode by
    slicing the stacked params' leading axis (round-1 gap: asserted out)."""
    x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    mask = jnp.ones((2, 5, 5), jnp.float32)
    hp_u = dataclasses.replace(HP, remat=remat)
    enc_u = TransformerEncoder(hp_u)
    v_unroll = jax.jit(lambda x, m: enc_u.init(
        jax.random.PRNGKey(0), x, m))(x, mask)
    out_prefix_u = jax.jit(lambda v, x, m: enc_u.apply(
        v, x, m, collect="colsum", num_layers=2))(v_unroll, x, mask)

    p = v_unroll["params"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[p[f"layer{i:02d}"] for i in range(3)])
    v_scan = {"params": {"layers": {"layer": stacked},
                         "final_ln": p["final_ln"]}}
    enc_s = TransformerEncoder(dataclasses.replace(HP, scan_layers=True,
                                                   remat=remat))
    out_prefix_s = jax.jit(lambda v, x, m: enc_s.apply(
        v, x, m, collect="colsum", num_layers=2))(v_scan, x, mask)
    np.testing.assert_allclose(np.asarray(out_prefix_s["hidden_state"]),
                               np.asarray(out_prefix_u["hidden_state"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_prefix_s["attn_colsum"]),
                               np.asarray(out_prefix_u["attn_colsum"]),
                               rtol=2e-5, atol=2e-5)
    # init with a prefix first-call still creates the full stack
    enc_i = TransformerEncoder(dataclasses.replace(HP, scan_layers=True))
    v_i = jax.jit(lambda x, m: enc_i.init(jax.random.PRNGKey(0), x, m,
                                          num_layers=2))(x, mask)
    assert v_i["params"]["layers"]["layer"]["attention"]["query"][
        "kernel"].shape[0] == 3


def test_remat_matches_plain(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
    mask = jnp.ones((2, 5, 5), jnp.float32)
    v, out_plain = _run(HP, x, mask)
    enc_r = TransformerEncoder(dataclasses.replace(HP, remat=True,
                                                   scan_layers=False))
    # remat shares the plain param structure
    out_r = jax.jit(lambda v, x, m: enc_r.apply(v, x, m))(v, x, mask)
    np.testing.assert_allclose(np.asarray(out_r["hidden_state"]),
                               np.asarray(out_plain["hidden_state"]),
                               rtol=1e-5, atol=1e-5)
    # and gradients flow
    loss = jax.jit(jax.grad(
        lambda v: jnp.sum(enc_r.apply(v, x, mask)["hidden_state"] ** 2)))(v)
    assert np.isfinite(float(jax.tree.leaves(loss)[0].sum()))


def test_param_partition_rules():
    assert param_partition_spec("encoder/layer00/attention/query/kernel",
                                np.zeros((32, 32)))[1] == "model"
    assert param_partition_spec("encoder/layers/layer/attention/query/kernel",
                                np.zeros((3, 32, 32)))[2] == "model"
    assert param_partition_spec("encoder/layers/layer/mlp/output/kernel",
                                np.zeros((3, 64, 32)))[1] == "model"
    spec = param_partition_spec("vision_backbone/resnet/stem_conv0/kernel",
                                np.zeros((3, 3, 3, 32)))
    assert all(s is None for s in spec)


def test_scan_pretrain_model_on_mesh(rng):
    """Full pretrain model with scan+remat over the 8-device mesh."""
    cfg = MerlotConfig(
        hidden_size=64, vocab_size=400, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, image_size=(32, 64),
        patch_size=16, spatial_pool_size=2, use_bfloat16=False,
        num_vision_transformer_hidden_layers=2,
        num_lang_transformer_hidden_layers=2, num_chunks_in_group=2,
        hidden_dropout_prob=0.0, scan_layers=True, remat=True,
        image_shuffle_prob=0.4)
    batch, chunks, L = 4, 2, 8
    b = {
        "images": jnp.asarray(rng.uniform(0, 1, (batch * chunks, 32, 64, 3)),
                              jnp.float32),
        "input_ids": jnp.asarray(rng.integers(100, 400, (batch, chunks, L)),
                                 jnp.int32),
        "shuffled_idx_img": jnp.asarray(
            np.tile(np.arange(2), batch * chunks // 2), jnp.int32),
        "video_src_ids": jnp.zeros((batch, chunks), jnp.int32),
    }
    model = MerlotPretrainModel(cfg)
    mesh = make_mesh(data=4, model=2)
    with mesh:
        v = jax.jit(lambda b: model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            b, deterministic=True))(b)
        params = shard_params(v["params"], mesh)
        loss, metrics, _ = jax.jit(lambda p, b, k: model.apply(
            {"params": p}, b, deterministic=True, rngs={"masking": k}))(
            params, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
