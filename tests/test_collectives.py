"""The distributed story, verified at the HLO level.

The reference hand-rolls its collectives (cross_replica_sum all-gather for
the contrastive towers, CrossShardOptimizer grad all-reduce). Our design
declares shardings and lets GSPMD insert them — this test compiles the FULL
training step over an 8-device mesh and asserts the collectives actually
appear in the lowered HLO (i.e. the batch really is data-parallel and the
model axis really does tensor parallelism, rather than silently
replicating)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.pretrain import MerlotPretrainModel
from merlot_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      param_shardings, shard_batch,
                                      shard_params)
from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW
from merlot_tpu.train.train_step import init_train_state, make_train_step

CFG = MerlotConfig(
    hidden_size=64, vocab_size=512, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128, image_size=(32, 32),
    patch_size=16, spatial_pool_size=1, use_bfloat16=False,
    num_vision_transformer_hidden_layers=2,
    num_lang_transformer_hidden_layers=2, num_chunks_in_group=2,
    hidden_dropout_prob=0.0, image_shuffle_prob=0.4)


def _batch(rng, batch=8):
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (batch * 2, 32, 32, 3)),
                              jnp.float32),
        "input_ids": jnp.asarray(rng.integers(100, 512, (batch, 2, 8)),
                                 jnp.int32),
        "shuffled_idx_img": jnp.asarray(
            np.tile([0, 1], batch), jnp.int32),
        "video_src_ids": jnp.zeros((batch, 2), jnp.int32),
    }


def test_mesh_step_lowers_to_ici_collectives(rng):
    mesh = make_mesh(data=4, model=2)
    model = MerlotPretrainModel(CFG)
    opt = MerlotAdamW(AdamWConfig(learning_rate=1e-3, num_train_steps=10,
                                  num_warmup_steps=0, clip_norm=0.0))
    batch = _batch(rng)
    with mesh:
        params, opt_state = init_train_state(model, opt, batch)
        params = shard_params(params, mesh)
        opt_state = {"step": opt_state["step"],
                     "m": shard_params(opt_state["m"], mesh),
                     "v": shard_params(opt_state["v"], mesh)}
        batch = shard_batch(batch, mesh)
        step = make_train_step(model, opt, donate=False)
        lowered = step.lower(params, opt_state, batch, jax.random.PRNGKey(0))
        hlo = lowered.compile().as_text()

    # gradient sync / contrastive gather over the data axis and
    # tensor-parallel rendezvous over the model axis must be present
    assert re.search(r"all-reduce", hlo), "no all-reduce in compiled HLO"
    assert re.search(r"all-gather|all-to-all|collective-permute|reduce-scatter",
                     hlo), "no gather-style collective in compiled HLO"
    # and the step still runs + produces finite loss
    with mesh:
        _, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_param_shardings_actually_split_model_axis():
    mesh = make_mesh(data=4, model=2)
    model = MerlotPretrainModel(CFG)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    opt = MerlotAdamW(AdamWConfig())
    params, _ = init_train_state(model, opt, batch)
    shardings = param_shardings(params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    model_sharded = [
        "/".join(str(getattr(k, "key", k)) for k in kp)
        for kp, s in flat if "model" in str(s.spec)
    ]
    # attention + mlp + vocab params carry the model axis
    assert any("attention/query/kernel" in p for p in model_sharded)
    assert any("mlp/intermediate/kernel" in p for p in model_sharded)
    assert any("word_embeddings" in p for p in model_sharded)
    # conv kernels replicated
    assert not any("conv" in p for p in model_sharded)


def test_zero1_shards_adam_state_and_matches_replicated(rng):
    """ZeRO-1 (device.use_zero1): Adam m/v shard over the data axis —
    per-chip state memory really drops — and two training steps produce
    the same params/loss as the replicated-state baseline (GSPMD turns
    all-reduce + sliced update + gather into RS -> local Adam -> AG; the
    math must be unchanged)."""
    from merlot_tpu.parallel.mesh import shard_opt_state, zero1_partition_spec

    mesh = make_mesh(data=4, model=2)
    model = MerlotPretrainModel(CFG)
    opt = MerlotAdamW(AdamWConfig(learning_rate=1e-3, num_train_steps=10,
                                  num_warmup_steps=0, clip_norm=0.0))
    batch = _batch(rng)
    key = jax.random.PRNGKey(0)

    def run(zero1):
        with mesh:
            params, opt_state = init_train_state(model, opt, batch)
            params = shard_params(params, mesh)
            if zero1:
                opt_state = shard_opt_state(opt_state, mesh)
            else:
                opt_state = {"step": opt_state["step"],
                             "m": shard_params(opt_state["m"], mesh),
                             "v": shard_params(opt_state["v"], mesh)}
            b = shard_batch(batch, mesh)
            step = make_train_step(model, opt, donate=False,
                                   mesh=mesh if zero1 else None, zero1=zero1)
            losses = []
            for _ in range(2):
                params, opt_state, metrics = step(params, opt_state, b, key)
            return params, opt_state, float(metrics["loss"])

    p_ref, _, loss_ref = run(zero1=False)
    p_z, st_z, loss_z = run(zero1=True)

    # the state really is sharded: some m leaf's addressable shard is
    # smaller than the full leaf along the chosen axis
    flat = jax.tree_util.tree_leaves(st_z["m"])
    assert any(x.addressable_shards[0].data.size < x.size for x in flat
               if x.ndim >= 1), "no m leaf actually sharded over data"
    # spec sanity: a 2-D TP kernel gets 'data' on its free axis
    spec = zero1_partition_spec("encoder/attention/query/kernel",
                                np.zeros((64, 64)), 4)
    assert "data" in spec

    # identical training math
    np.testing.assert_allclose(loss_z, loss_ref, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
