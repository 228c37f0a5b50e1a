"""AdamW: schedule shape, overrides/freezing, bf16-v encoding, convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.train.optimizer import (AdamWConfig, MerlotAdamW, decode_v,
                                        encode_v)


def test_schedule_warmup_then_linear_decay():
    cfg = AdamWConfig(learning_rate=1.0, num_train_steps=100,
                      num_warmup_steps=10)
    opt = MerlotAdamW(cfg)
    s = lambda t: float(opt.lr_scale(jnp.asarray(t)))
    assert s(0) == 0.0
    assert s(5) == pytest.approx(0.5)
    # right after warmup the scale peaks at ~1.0 (pre-scaled decay)
    assert s(10) == pytest.approx(100 / 91 * 0.9, rel=1e-5)
    assert abs(s(10) - 1.0) < 0.02
    assert s(100) == pytest.approx(0.0, abs=1e-6)
    assert s(55) == pytest.approx(100 / 91 * 0.45, rel=1e-5)


def test_single_step_matches_manual_adam():
    cfg = AdamWConfig(learning_rate=0.1, num_train_steps=10,
                      num_warmup_steps=0, weight_decay_rate=0.0,
                      beta_1=0.9, beta_2=0.98, epsilon=1e-6, clip_norm=0.0)
    opt = MerlotAdamW(cfg)
    params = {"w": jnp.asarray([1.0, -2.0])}
    grads = {"w": jnp.asarray([0.5, 0.25])}
    state = opt.init(params)
    new_params, state, _ = opt.update(grads, state, params)

    g = np.array([0.5, 0.25])
    m = 0.1 * g
    v = 0.02 * (g ** 2 + 1e-30)
    lr = 0.1 * np.sqrt(1 - 0.98) / (1 - 0.9)
    want = np.array([1.0, -2.0]) - lr * m / (np.sqrt(v) + 1e-6)
    np.testing.assert_allclose(np.asarray(new_params["w"]), want, rtol=1e-5)


def test_overrides_and_freezing():
    cfg = AdamWConfig(learning_rate=0.1, num_train_steps=10,
                      num_warmup_steps=0, weight_decay_rate=0.5,
                      clip_norm=0.0,
                      param_overrides=(
                          (("bias",), {"weight_decay_rate": 0.0}),
                          (("frozen",), {"learning_rate": 0.0})))
    opt = MerlotAdamW(cfg)
    params = {"layer": {"kernel": jnp.ones(3), "bias": jnp.ones(3)},
              "frozen_emb": jnp.ones(3)}
    grads = jax.tree.map(jnp.zeros_like, params)
    state = opt.init(params)
    new_params, _, _ = opt.update(grads, state, params)
    # zero grad: kernel still decays, bias doesn't, frozen untouched
    assert float(new_params["layer"]["kernel"][0]) < 1.0
    assert float(new_params["layer"]["bias"][0]) == 1.0
    assert float(new_params["frozen_emb"][0]) == 1.0


def test_encode_v_halves_bf16_error(rng):
    v = jnp.asarray(np.abs(rng.standard_normal(4096)).astype(np.float32))
    plain_err = np.abs(np.asarray(v.astype(jnp.bfloat16), np.float32) - np.asarray(v))
    coded_err = np.abs(np.asarray(decode_v(encode_v(v))) - np.asarray(v))
    # strictly never worse; ~12% lower mean error (bf16 already rounds to
    # nearest, so the sign-bit half-quantum correction helps at the margin)
    assert coded_err.mean() < plain_err.mean() * 0.95
    assert (coded_err <= plain_err + 1e-9).all()


def test_bf16_adam_converges_on_quadratic():
    cfg = AdamWConfig(learning_rate=0.05, num_train_steps=300,
                      num_warmup_steps=0, weight_decay_rate=0.0,
                      clip_norm=0.0, use_bfloat16_adam=True)
    opt = MerlotAdamW(cfg)
    target = jnp.asarray([3.0, -1.0, 0.5])
    params = {"w": jnp.zeros(3)}
    state = opt.init(params)
    assert state["m"]["w"].dtype == jnp.bfloat16

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum((p["w"] - target) ** 2))(params)
        return opt.update(grads, state, params)

    for _ in range(200):
        params, state, metrics = step(params, state)
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(target),
                               atol=0.05)


def test_verbose_gradnorms():
    cfg = AdamWConfig(learning_rate=0.1, num_train_steps=10,
                      num_warmup_steps=0, clip_norm=0.0, verbose=True,
                      gradnorm_depth=1)
    opt = MerlotAdamW(cfg)
    params = {"enc": {"w": jnp.ones(4)}, "head": {"w": jnp.ones(4)}}
    grads = {"enc": {"w": jnp.full(4, 2.0)}, "head": {"w": jnp.zeros(4)}}
    state = opt.init(params)
    _, _, metrics = opt.update(grads, state, params)
    assert float(metrics["gradnorms/enc"]) == pytest.approx(4.0)
    assert float(metrics["gradnorms/head"]) == 0.0
    assert "weight_decay_loss" in metrics
