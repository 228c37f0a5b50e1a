"""Downstream tasks: sort_story zero-shot pipeline + VCR heads/loaders."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.data.tfrecord import TFRecordWriter, encode_example
from merlot_tpu.downstream.sort_story.data import write_synthetic_story_shard
from merlot_tpu.downstream.sort_story.dataloader import story_batches
from merlot_tpu.downstream.sort_story.score_permutations import (
    absolute_distance, best_permutation, evaluate_stories, pairwise_acc,
    score_h5, spearman_acc)
from merlot_tpu.downstream.sort_story.zero_shot import (make_zero_shot_fn,
                                                        run_zero_shot)
from merlot_tpu.models.config import MerlotConfig

TINY_STORY_CFG = MerlotConfig(
    hidden_size=64, vocab_size=50370, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=128, image_size=(32, 64),
    patch_size=16, spatial_pool_size=2, use_bfloat16=False,
    num_vision_transformer_hidden_layers=2,
    num_lang_transformer_hidden_layers=2, num_chunks_in_group=5,
    hidden_dropout_prob=0.0)


def test_scorer_metrics_identity_and_reverse():
    assert spearman_acc([0, 1, 2, 3, 4]) == pytest.approx(1.0)
    assert spearman_acc([4, 3, 2, 1, 0]) == pytest.approx(-1.0)
    assert absolute_distance([0, 1, 2, 3, 4]) == 0.0
    assert pairwise_acc([0, 1, 2, 3, 4]) == 1.0
    assert pairwise_acc([4, 3, 2, 1, 0]) == 0.0


def test_best_permutation_recovers_planted_order():
    """Plant probabilities consistent with a known order -> argmax finds it.

    probs[i, j] relates lang chunk i (rank i: sentences are displayed in
    story order) to image j whose true rank is true_perm[j]; the scorer
    hypothesizes image ranks and must recover true_perm.
    """
    true_perm = (2, 0, 4, 1, 3)  # true rank of each displayed image
    probs = np.full((5, 5, 3), 0.05)
    for i in range(5):
        for j in range(5):
            tj = true_perm[j]
            if i == tj:
                probs[i, j, 0] = 0.9
            elif i < tj:
                probs[i, j, 1] = 0.9
            else:
                probs[i, j, 2] = 0.9
    assert best_permutation(probs) == true_perm


def test_sort_story_end_to_end(tmp_path):
    shard = str(tmp_path / "stories.tfrecord")
    n = write_synthetic_story_shard(shard, num_stories=2, just_one_perm=True,
                                    img_hw=(40, 60))
    assert n == 2
    cfg = TINY_STORY_CFG
    merged = {"num_chunks": 5, "image_size": list(cfg.image_size)}
    batches = list(story_batches([shard], merged, batch_size=2))
    assert len(batches) == 1
    b = batches[0]
    assert b["images"].shape == (2, 5, 32, 64, 3)
    assert b["sentences"].shape == (2, 5, 32)

    model, fn, init_fn = make_zero_shot_fn(cfg, batch_size=2, num_chunks=5)
    variables = jax.jit(init_fn)(jax.random.PRNGKey(0),
                                 jnp.asarray(b["images"]),
                                 jnp.asarray(b["sentences"]))
    out = fn(variables, jnp.asarray(b["images"]), jnp.asarray(b["sentences"]))
    assert out["lang_viz_probs"].shape == (2, 5, 5, 3)
    probs = np.asarray(out["lang_viz_probs"])
    assert np.isfinite(probs).all() and (probs >= 0).all()

    # full driver -> h5 -> scorer
    h5_path = str(tmp_path / "logits.h5")
    n_written = run_zero_shot(variables, cfg, iter(batches), h5_path,
                              batch_size=2, num_chunks=5)
    assert n_written == 2
    metrics = score_h5(h5_path)
    assert set(metrics) == {"spearman", "absolute_distance", "pairwise"}
    assert -1.0 <= metrics["spearman"] <= 1.0


# ----------------------------------------------------------------------
# VCR
# ----------------------------------------------------------------------
def _write_synthetic_vcr_shard(path, n=2, img_hw=(40, 60), seed=0):
    from merlot_tpu.data.make_synthetic_tfrecord import _random_jpeg
    rng = np.random.default_rng(seed)
    with TFRecordWriter(path) as w:
        for i in range(n):
            feats = {"img_id": f"val-{i}".encode(),
                     "annot_id": f"val-{i}".encode(),
                     "label/answer_label": [int(rng.integers(0, 4))],
                     "label/rationale_label": [int(rng.integers(0, 4))]}
            for mode in ("answer", "rationale"):
                for draw in ("bbox", "segm"):
                    feats[f"{mode}/{draw}/image/encoded"] = _random_jpeg(rng, *img_hw)
                    feats[f"{mode}/{draw}/image/format"] = b"jpeg"
                    feats[f"{mode}/{draw}/image/key/sha256"] = b"x"
                feats[f"{mode}/ctx"] = list(rng.integers(100, 50357, 10))
                feats[f"{mode}/ctx_tags"] = [0] * 10
                for c in range(4):
                    feats[f"{mode}/choice_{c}"] = list(rng.integers(100, 50357, 6))
                    feats[f"{mode}/choice_tags_{c}"] = [0] * 6
            w.write(encode_example(feats))


def test_vcr_loaders_and_model(tmp_path):
    from merlot_tpu.downstream.vcr.dataloader import (vcr_eval_batches,
                                                      vcr_joint_batches)
    from merlot_tpu.downstream.vcr.modeling import (VCRModel,
                                                    vcr_loss_and_metrics)

    shard = str(tmp_path / "vcr.tfrecord")
    _write_synthetic_vcr_shard(shard, n=2)
    config = {"image_size": [32, 64], "draw": "segm"}

    batch = next(vcr_joint_batches([shard], config, batch_size=2,
                                   is_training=True, repeat=False))
    assert batch["images"].shape == (4, 32, 64, 3)
    assert batch["lm_input"].shape == (16, 184)
    assert batch["lm_targets"].shape == (4,)
    # prompt starts every sequence with START
    assert (batch["lm_input"][:, 0] == 2).all()

    cfg = MerlotConfig(
        hidden_size=64, vocab_size=50370, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, image_size=(32, 64),
        patch_size=16, spatial_pool_size=2, use_bfloat16=False,
        num_vision_transformer_hidden_layers=2,
        num_lang_transformer_hidden_layers=2, hidden_dropout_prob=0.0,
        num_texts=4, max_position_embeddings=256)
    model = VCRModel(cfg)
    img = jnp.asarray(batch["images"])
    ids = jnp.asarray(batch["lm_input"])
    variables = jax.jit(lambda i, t: model.init(jax.random.PRNGKey(0), i, t))(
        img, ids)
    logits = jax.jit(lambda v, i, t: model.apply(v, i, t))(variables, img, ids)
    assert logits.shape == (4, 4)
    loss, metrics = vcr_loss_and_metrics(logits,
                                         jnp.asarray(batch["lm_targets"]))
    assert np.isfinite(float(loss))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0

    # eval path: single mode, [b, 4, 184]
    ebatch = next(vcr_eval_batches([shard], config, batch_size=2,
                                   mode="answer"))
    assert ebatch["images"].shape == (2, 32, 64, 3)
    assert ebatch["lm_input"].shape == (2, 4, 184)
    elogits = jax.jit(lambda v, i, t: model.apply(v, i, t, mode="answer"))(
        variables, jnp.asarray(ebatch["images"]), jnp.asarray(ebatch["lm_input"]))
    assert elogits.shape == (2, 4)


def test_vcr_record_shuffle(tmp_path):
    """Record-level shuffle buffer (reference dataloader_joint.py:249-251):
    training order differs across seeds and across epochs, covers every
    example exactly once per epoch; eval order is stable and sequential."""
    from merlot_tpu.downstream.vcr.dataloader import (vcr_eval_batches,
                                                      vcr_joint_batches)
    shard = str(tmp_path / "vcr.tfrecord")
    n = 24
    _write_synthetic_vcr_shard(shard, n=n)
    config = {"image_size": [32, 64], "draw": "segm",
              "shuffle_buffer_size": 8}

    def epoch_order(seed):
        return [bytes(b["lm_input"][:4].tobytes())
                for b in vcr_joint_batches([shard], config, batch_size=1,
                                           is_training=True, seed=seed,
                                           repeat=False)]

    o0, o1 = epoch_order(0), epoch_order(1)
    assert len(o0) == n and sorted(o0) == sorted(o1)   # same example set
    assert o0 != o1                                    # seed changes order
    assert o0 != sorted(o0)                            # actually shuffled

    # two epochs of ONE training stream: different order, same set
    it = vcr_joint_batches([shard], config, batch_size=1, is_training=True,
                           seed=0, repeat=True)
    e1 = [bytes(next(it)["lm_input"][:4].tobytes()) for _ in range(n)]
    e2 = [bytes(next(it)["lm_input"][:4].tobytes()) for _ in range(n)]
    assert sorted(e1) == sorted(e2) and e1 != e2

    # eval: sequential file order, repeatable
    ev = [bytes(b["lm_input"].tobytes())
          for b in vcr_eval_batches([shard], config, 1, mode="answer")]
    ev2 = [bytes(b["lm_input"].tobytes())
           for b in vcr_eval_batches([shard], config, 1, mode="answer")]
    assert ev == ev2 and len(ev) == n


def test_story_loader_shuffle(tmp_path):
    """sort_story training path: shuffled per seed; eval path unchanged
    (sequential — permutation scoring depends on stable order)."""
    from merlot_tpu.downstream.sort_story.dataloader import story_batches
    shard = str(tmp_path / "story.tfrecord")
    write_synthetic_story_shard(shard, num_stories=12, just_one_perm=True,
                                img_hw=(32, 48), seed=0)
    config = {"image_size": [32, 48], "num_chunks": 5,
              "shuffle_buffer_size": 4}

    def order(**kw):
        return [int(b["story_id"][0])
                for b in story_batches([shard], config, 1, **kw)]

    ev = order()
    assert ev == sorted(ev)                     # eval stays sequential
    t0, t1 = order(is_training=True, seed=0), order(is_training=True, seed=1)
    assert sorted(t0) == ev and sorted(t1) == ev
    assert t0 != ev or t1 != ev                 # shuffling happened


def test_vcr_tokenizer_grounding():
    from merlot_tpu.downstream.vcr.data_prep import (GENDER_NEUTRAL_NAMES,
                                                     VCRTokenizer)
    vt = VCRTokenizer()
    objects = ["person", "person", "car"]
    ids, tags = vt(["Does", [1], "like", "the", [2], "?"], objects)
    assert len(ids) == len(tags)
    text = vt.tok.decode(ids)
    assert GENDER_NEUTRAL_NAMES[1] in text   # person 1 -> Riley
    assert "car" in text
    # tags: person tokens tagged 2 (obj idx 1 + 1), car tokens tagged 3
    assert 2 in tags and 3 in tags and 0 in tags


def test_vcr_draw_grounding():
    from PIL import Image
    from merlot_tpu.downstream.vcr.data_prep import draw_grounding
    img = Image.new("RGB", (80, 60), (128, 128, 128))
    boxes = [[5, 5, 40, 30, 0.9], [45, 10, 75, 50, 0.8]]
    out = draw_grounding(img, boxes, mentions=[0], objects=[1], kind="bbox")
    arr = np.asarray(out)
    assert arr.shape == (60, 80, 3)
    # mention 0 outline is COLOR_LIST[0] = red-ish
    assert (arr[5, 20, 0] > 200) and (arr[5, 20, 1] < 100)
    # segm variant runs
    segms = [[[(10, 10), (30, 10), (20, 25)]], []]
    out2 = draw_grounding(img, segms, mentions=[0], objects=[], kind="segm")
    assert np.asarray(out2).shape == (60, 80, 3)


def test_zero_shot_data_parallel_matches_single_device(tmp_path):
    """The mesh-sharded eval path (batch divides the 8 virtual devices)
    must produce the same probs as plain device-0 execution."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from merlot_tpu.parallel.mesh import make_mesh

    cfg = TINY_STORY_CFG
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (8, 5, 32, 64, 3)), jnp.float32)
    sents = jnp.asarray(rng.integers(100, 1000, (8, 5, 32)), jnp.int32)

    model, fn, init_fn = make_zero_shot_fn(cfg, batch_size=8, num_chunks=5)
    variables = jax.jit(init_fn)(jax.random.PRNGKey(0), images, sents)
    plain = jax.device_get(fn(variables, images, sents))

    mesh = make_mesh(data=len(jax.devices()), model=1)
    data_s = NamedSharding(mesh, P("data"))
    v_rep = jax.device_put(variables, NamedSharding(mesh, P()))
    sharded = jax.device_get(fn(v_rep, jax.device_put(images, data_s),
                                jax.device_put(sents, data_s)))
    for k in plain:
        np.testing.assert_allclose(np.asarray(sharded[k]),
                                   np.asarray(plain[k]), rtol=2e-5, atol=2e-5)
