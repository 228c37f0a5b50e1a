"""Trainer aux subsystems: profiler trace capture + EVAL metric means."""

import glob
import os

import jax
import numpy as np
import pytest

from tests.test_harness import CFG, _batch, _stream
from merlot_tpu.models.pretrain import MerlotPretrainModel
from merlot_tpu.train.harness import Trainer
from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW


def test_profiler_trace_capture(tmp_path, rng):
    out = str(tmp_path / "run")
    prof = str(tmp_path / "trace")
    model = MerlotPretrainModel(CFG)
    opt = MerlotAdamW(AdamWConfig(learning_rate=1e-3, num_train_steps=10,
                                  num_warmup_steps=0, clip_norm=0.0))
    trainer = Trainer(model, opt, output_dir=out, log_every=1,
                      checkpoint_every=100, profile_dir=prof,
                      profile_steps=range(1, 3))
    params, opt_state = trainer.init_state(_batch(rng))
    trainer.run(params, opt_state, _stream(rng, 4), num_steps=4)
    # a perfetto/xplane trace landed under the profile dir
    traces = glob.glob(os.path.join(prof, "**", "*"), recursive=True)
    assert any("xplane" in t or t.endswith(".json.gz") or "trace" in t
               for t in traces), traces


def test_evaluate_metric_means(tmp_path, rng):
    out = str(tmp_path / "run")
    model = MerlotPretrainModel(CFG)
    opt = MerlotAdamW(AdamWConfig(learning_rate=1e-3, num_train_steps=10,
                                  num_warmup_steps=0, clip_norm=0.0))
    trainer = Trainer(model, opt, output_dir=out)
    params, _ = trainer.init_state(_batch(rng))
    means = trainer.evaluate(params, _stream(rng, 3), max_batches=3,
                             log_step=1)
    assert "loss" in means and "lang/loss" in means
    assert np.isfinite(means["loss"])
    # eval is deterministic: same stream -> same means
    means2 = trainer.evaluate(params, _stream(np.random.default_rng(0), 3),
                              max_batches=3)
    assert means2["loss"] == pytest.approx(
        trainer.evaluate(params, _stream(np.random.default_rng(0), 3),
                         max_batches=3)["loss"])
    # repeated evaluate() calls reuse ONE compiled program (the validate
    # sidecar polls in a loop): the jitted closure lives on the Trainer
    # and its specialization cache holds exactly one entry after 3 calls
    assert trainer.eval_fn._cache_size() == 1
