"""Fused GroupNorm(+residual+ReLU) pallas kernel vs the unfused
norms.group_norm composition (interpret mode on CPU): forward + gradients,
including the stem's 32-channel/32-group (cpg=1) shape and the VMEM guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from merlot_tpu.ops import pallas_groupnorm as pgn


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk(rng, b, h, w, c, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c)), dtype)
    gamma = jnp.asarray(rng.normal(1, 0.1, (c,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, (c,)), jnp.float32)
    return x, gamma, beta


@pytest.mark.parametrize("c,groups", [(256, 32), (64, 32), (32, 32)])
@pytest.mark.parametrize("mode", ["plain", "relu", "residual"])
def test_forward_matches_unfused(rng, c, groups, mode):
    x, gamma, beta = _mk(rng, 2, 6, 11, c)
    res = (jnp.asarray(rng.normal(0, 1, x.shape), x.dtype)
           if mode == "residual" else None)
    relu = mode != "plain"

    want = pgn._unfused(x, gamma, beta, res, groups, 1e-4, relu)
    with pltpu.force_tpu_interpret_mode():
        got = pgn.group_norm_act(x, gamma, beta, residual=res,
                                 num_groups=groups, relu=relu,
                                 backend="pallas")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)
    # fp32 inputs: only reduction order differs -> very tight
    xf, resf = x.astype(jnp.float32), (None if res is None
                                       else res.astype(jnp.float32))
    want32 = pgn._unfused(xf, gamma, beta, resf, groups, 1e-4, relu)
    with pltpu.force_tpu_interpret_mode():
        got32 = pgn.group_norm_act(xf, gamma, beta, residual=resf,
                                   num_groups=groups, relu=relu,
                                   backend="pallas")
    np.testing.assert_allclose(np.asarray(got32), np.asarray(want32),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", ["plain", "relu", "residual"])
def test_gradients_match_unfused(rng, mode):
    c, groups = 64, 32
    x, gamma, beta = _mk(rng, 2, 4, 7, c, jnp.float32)
    res = (jnp.asarray(rng.normal(0, 1, x.shape), x.dtype)
           if mode == "residual" else None)
    relu = mode != "plain"

    def loss_unfused(x, g, b, r):
        out = pgn._unfused(x, g, b, r, groups, 1e-4, relu)
        return jnp.sum(out * out)

    def loss_fused(x, g, b, r):
        out = pgn.group_norm_act(x, g, b, residual=r, num_groups=groups,
                                 relu=relu, backend="pallas")
        return jnp.sum(out * out)

    argnums = (0, 1, 2) if res is None else (0, 1, 2, 3)
    want = jax.grad(loss_unfused, argnums)(x, gamma, beta, res)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fused, argnums)(x, gamma, beta, res)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_vmem_guard_and_auto_fallback(rng):
    # a group1-at-192x352 shaped tensor exceeds the per-image budget
    assert not pgn.kernel_supported(48 * 88, 256, 32, 2, True)
    assert pgn.kernel_supported(48 * 88, 64, 32, 2, False)
    assert pgn.kernel_supported(24 * 44, 512, 32, 2, True)
    # backend='auto' off-TPU falls back to the unfused path (no pallas)
    x, gamma, beta = _mk(rng, 1, 4, 4, 64)
    out = pgn.group_norm_act(x, gamma, beta, backend="auto")
    want = pgn._unfused(x, gamma, beta, None, 32, 1e-4, False)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(want, np.float32))


def test_resnet_forward_unchanged_with_xla_backend(rng):
    """LiteResNet with the new fused call-sites on the XLA backend equals
    the pre-change composition (regression: relu/residual wiring)."""
    from merlot_tpu.nn.vit import LiteResNet
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    model = LiteResNet(layers=(1, 1), width=64, dtype=jnp.float32)
    v = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x))(x)
    out = jax.jit(lambda v, x: model.apply(v, x))(v, x)
    assert out.shape == (2, 4, 4, 4 * 128)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # relu really applied at the block output
    assert float(jnp.min(out)) >= 0.0
