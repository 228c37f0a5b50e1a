"""VCR finetune: full train step + eval-sidecar accuracy path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.downstream.vcr.modeling import VCRModel, vcr_loss_and_metrics
from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW
from merlot_tpu.train.train_step import make_loss_train_step

CFG = MerlotConfig(
    hidden_size=32, vocab_size=400, num_hidden_layers=1,
    num_attention_heads=2, intermediate_size=64, image_size=(32, 32),
    patch_size=16, spatial_pool_size=1, use_bfloat16=False,
    num_vision_transformer_hidden_layers=1,
    num_lang_transformer_hidden_layers=1, hidden_dropout_prob=0.1,
    num_texts=4, max_position_embeddings=192)


def test_vcr_train_step_and_eval(rng, tmp_path):
    model = VCRModel(CFG)
    opt = MerlotAdamW(AdamWConfig(learning_rate=1e-3, num_train_steps=10,
                                  num_warmup_steps=0, clip_norm=0.0))
    b = {
        "images": jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32),
        "lm_input": jnp.asarray(rng.integers(100, 400, (16, 24)), jnp.int32),
        "lm_targets": jnp.asarray(rng.integers(0, 4, (4,)), jnp.int32),
    }
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b["images"], b["lm_input"]))(b)
    params = variables["params"]
    opt_state = jax.jit(opt.init)(params)

    def loss_fn(p, batch, key):
        logits = model.apply({"params": p}, batch["images"],
                             batch["lm_input"], deterministic=False,
                             rngs={"dropout": key})
        return vcr_loss_and_metrics(logits, batch["lm_targets"])

    step = make_loss_train_step(loss_fn, opt)
    losses = []
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state, b,
                                          jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits the fixed batch

    # eval sidecar path with predictions dump
    from merlot_tpu.downstream.vcr.validate import evaluate_checkpoint
    from tests.test_downstream import _write_synthetic_vcr_shard
    shard = str(tmp_path / "vcr.tfrecord")
    _write_synthetic_vcr_shard(shard, n=2, img_hw=(40, 40))
    pred_path = str(tmp_path / "preds.jsonl")
    acc = evaluate_checkpoint(model, params, [shard],
                              {"image_size": [32, 32], "draw": "segm"},
                              batch_size=2, mode="answer",
                              predictions_path=pred_path)
    assert 0.0 <= acc <= 1.0
    import json
    preds = [json.loads(l) for l in open(pred_path)]
    assert len(preds) == 2 and all("log_probs" in p for p in preds)
    assert preds[0]["annot_id"].startswith("val-")


def test_vcr_eval_data_sharded_matches_replicated(rng, tmp_path):
    """The mesh-sharded eval branch (batch divides the 8 virtual devices)
    must produce the same accuracy and predictions as forcing the
    replicated fallback (mesh=None keeps plain jit on one device)."""
    import json
    from merlot_tpu.downstream.vcr.validate import evaluate_checkpoint
    from tests.test_downstream import _write_synthetic_vcr_shard

    model = VCRModel(CFG)
    b = {
        "images": jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32),
        "lm_input": jnp.asarray(rng.integers(100, 400, (16, 24)), jnp.int32),
    }
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b["images"], b["lm_input"]))(b)
    params = variables["params"]

    shard = str(tmp_path / "vcr8.tfrecord")
    _write_synthetic_vcr_shard(shard, n=8, img_hw=(40, 40))
    cfg = {"image_size": [32, 32], "draw": "segm"}

    outs = {}
    for name, ndev in (("sharded", len(jax.devices())), ("plain", None)):
        pred = str(tmp_path / f"preds_{name}.jsonl")
        if ndev:
            from merlot_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(data=ndev, model=1)
            acc = evaluate_checkpoint(model, params, [shard], cfg,
                                      batch_size=8, mode="answer",
                                      predictions_path=pred, mesh=mesh)
        else:
            # force the single-device path even on the 8-device host
            real_devices = jax.devices
            jax.devices = lambda: real_devices()[:1]
            try:
                acc = evaluate_checkpoint(model, params, [shard], cfg,
                                          batch_size=8, mode="answer",
                                          predictions_path=pred)
            finally:
                jax.devices = real_devices
        outs[name] = (acc, [json.loads(l) for l in open(pred)])

    assert outs["sharded"][0] == outs["plain"][0]
    for a, b2 in zip(outs["sharded"][1], outs["plain"][1]):
        assert a["prediction"] == b2["prediction"]
        np.testing.assert_allclose(a["log_probs"], b2["log_probs"],
                                   rtol=2e-5, atol=2e-5)
