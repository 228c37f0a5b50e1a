"""Unit tests for the numerics layer, using torch / handwritten oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.ops import (cross_entropy_with_logits, gelu,
                            group_norm, layer_norm, standardize_kernel)
from merlot_tpu.ops.attention import attention_core
from merlot_tpu.ops.sampling import gumbel_topk_without_replacement


def test_gelu_matches_erf_oracle(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)))
    import scipy.special
    want = x * 0.5 * (1.0 + scipy.special.erf(x / np.sqrt(2.0)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((3, 7, 32)).astype(np.float32)
    gamma = rng.standard_normal(32).astype(np.float32)
    beta = rng.standard_normal(32).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(gamma),
                                jnp.asarray(beta), epsilon=1e-5))
    import torch
    import torch.nn.functional as F
    want = F.layer_norm(torch.tensor(x), (32,), torch.tensor(gamma),
                        torch.tensor(beta), eps=1e-5).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_layer_norm_bf16_roundtrip(rng):
    x = rng.standard_normal((4, 32)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    out = layer_norm(xb, jnp.ones(32), jnp.zeros(32))
    assert out.dtype == jnp.bfloat16
    # fp32 statistics => close to the fp32 answer even from bf16 input
    ref = layer_norm(jnp.asarray(x), jnp.ones(32), jnp.zeros(32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 64)).astype(np.float32)
    gamma = rng.standard_normal(64).astype(np.float32)
    beta = rng.standard_normal(64).astype(np.float32)
    got = np.asarray(group_norm(jnp.asarray(x), jnp.asarray(gamma),
                                jnp.asarray(beta), num_groups=32, epsilon=1e-4))
    import torch
    import torch.nn.functional as F
    xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW for torch
    want = F.group_norm(xt, 32, torch.tensor(gamma), torch.tensor(beta),
                        eps=1e-4).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_weight_standardization(rng):
    k = rng.standard_normal((3, 3, 16, 32)).astype(np.float32)
    got = np.asarray(standardize_kernel(jnp.asarray(k)))
    mean = k.mean(axis=(0, 1, 2), keepdims=True)
    var = k.var(axis=(0, 1, 2), keepdims=True)
    want = (k - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_wsconv_space_to_depth_equivalent(rng):
    """space_to_depth folds the stride-2 3x3 stem conv into a stride-1
    2x2 conv over the s2d input — same products, possibly different
    summation order (layers._space_to_depth_fold); gradients must agree
    too since this is a training-path knob. Odd spatial dims fall back to
    the standard path exactly."""
    from merlot_tpu.nn.layers import WSConv
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 3)), jnp.float32)
    conv = WSConv(8, 3, strides=2, dtype=jnp.float32)
    conv_s = WSConv(8, 3, strides=2, dtype=jnp.float32, space_to_depth=True)
    v = conv.init(jax.random.PRNGKey(0), x)
    y = np.asarray(conv.apply(v, x))
    y_s = np.asarray(conv_s.apply(v, x))  # identical param tree
    assert y.shape == y_s.shape == (2, 8, 12, 8)
    np.testing.assert_allclose(y, y_s, rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda v: jnp.sum(conv.apply(v, x) ** 2))(v)
    g_s = jax.grad(lambda v: jnp.sum(conv_s.apply(v, x) ** 2))(v)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    x_odd = jnp.asarray(rng.standard_normal((2, 15, 23, 3)), jnp.float32)
    np.testing.assert_array_equal(np.asarray(conv.apply(v, x_odd)),
                                  np.asarray(conv_s.apply(v, x_odd)))


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((6, 11)).astype(np.float32)
    labels = rng.integers(0, 11, size=6)
    got = np.asarray(cross_entropy_with_logits(jnp.asarray(logits),
                                               jnp.asarray(labels)))
    import torch
    import torch.nn.functional as F
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                           reduction="none").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_attention_matches_naive(rng):
    B, S, H, D = 2, 10, 4, 8
    q = rng.standard_normal((B, S, H, D)).astype(np.float32)
    k = rng.standard_normal((B, S, H, D)).astype(np.float32)
    v = rng.standard_normal((B, S, H, D)).astype(np.float32)
    valid = rng.integers(0, 2, size=(B, S)).astype(bool)
    valid[:, 0] = True
    mask = (valid[:, None] & valid[:, :, None]).astype(np.float32)

    ctx, probs = attention_core(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                jnp.asarray(mask), collect="probs")

    # naive oracle with the reference's score*mask - 1e10*(1-mask) semantics
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
    m = mask[:, None]
    scores = scores * m - 1e10 * (1 - m)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want_ctx = np.einsum("bhqk,bkhd->bqhd", p, v)
    np.testing.assert_allclose(np.asarray(ctx), want_ctx, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(probs), p.mean(1), rtol=2e-4, atol=2e-4)


def test_attention_colsum_consistent(rng):
    B, S, H, D = 2, 12, 3, 8
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    _, colsum = attention_core(q, k, v, None, collect="colsum")
    # every query row sums to 1, head-meaned => total mass per example = S
    np.testing.assert_allclose(np.asarray(colsum).sum(-1),
                               np.full(B, S, np.float32), rtol=1e-5)


def test_gumbel_topk_no_replacement_and_distribution():
    key = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.asarray([[0.7, 0.1, 0.1, 0.05, 0.05]] * 4000))
    idx = gumbel_topk_without_replacement(key, logits, 2)
    idx_np = np.asarray(idx)
    # no repeats within a draw
    assert (idx_np[:, 0] != idx_np[:, 1]).all()
    # the high-probability element appears first ~70% of the time
    frac = (idx_np[:, 0] == 0).mean()
    assert 0.65 < frac < 0.75


def test_norm_bwd_stats_matches_xhat(rng):
    """The sufficient-statistics backward ('stats', default — never forms an
    x_hat tensor, so XLA has no fp32 [B,H,W,C] intermediate to materialize)
    must match the literal textbook form ('xhat') to fp32 reassociation
    tolerance, for both norms, on bf16 inputs like training uses."""
    import jax
    import jax.numpy as jnp

    from merlot_tpu.ops import norms

    x = jnp.asarray(rng.standard_normal((48, 96)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal(96) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(96) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.standard_normal((48, 96)), jnp.float32)

    def ln_loss(x, g, b):
        return jnp.sum(norms.layer_norm(x, g, b).astype(jnp.float32) * dy)

    xg = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.bfloat16)
    gg = jnp.asarray(rng.standard_normal(32) * 0.1 + 1.0, jnp.float32)
    bg = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)
    dyg = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)

    def gn_loss(x, g, b):
        return jnp.sum(
            norms.group_norm(x, g, b, 4, 1e-4, True).astype(jnp.float32) * dyg)

    outs = {}
    old_ln, old_gn = norms.LN_BWD, norms.GN_BWD
    try:
        for mode in ("xhat", "stats"):
            norms.LN_BWD = norms.GN_BWD = mode
            outs[mode] = (
                jax.grad(ln_loss, argnums=(0, 1, 2))(x, g, b)
                + jax.grad(gn_loss, argnums=(0, 1, 2))(xg, gg, bg))
    finally:
        norms.LN_BWD, norms.GN_BWD = old_ln, old_gn

    for a, w in zip(outs["stats"], outs["xhat"]):
        # dx is cast to bf16 — reassociated fp32 math can land one bf16 ulp
        # away at rounding boundaries (rtol 1/128); fp32 param grads stay
        # at fp32 reassociation tolerance.
        rtol = 1e-2 if a.dtype == jnp.bfloat16 else 2e-4
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(w, np.float32),
            rtol=rtol, atol=1e-4)


def test_norm_custom_vjp_matches_autodiff(rng):
    """layer_norm/group_norm carry hand-written backwards (to stop XLA from
    saving fp32 activation copies); they must equal autodiff of the same
    math to float tolerance."""
    import jax
    import jax.numpy as jnp

    from merlot_tpu.ops import norms

    x = jnp.asarray(rng.standard_normal((4, 6, 64)) * 2 + 0.5, jnp.float32)
    g = jnp.asarray(rng.standard_normal(64) * 0.1 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)

    def ln_ref(x, g, b):
        mean = jnp.mean(x, -1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), -1, keepdims=True)
        s = jax.lax.rsqrt(var + 1e-5) * g
        return x * s - mean * s + b

    def loss_custom(x, g, b):
        return jnp.sum(jnp.sin(norms.layer_norm(x, g, b)))

    def loss_ref(x, g, b):
        return jnp.sum(jnp.sin(ln_ref(x, g, b)))

    got = jax.grad(loss_custom, argnums=(0, 1, 2))(x, g, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, g, b)
    for a, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)

    # group norm vs autodiff of an equivalent plain-math forward
    xg = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.float32)
    gg = jnp.asarray(rng.standard_normal(32) * 0.1 + 1.0, jnp.float32)
    bg = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)

    def gn_ref(x, g, b):
        B, h, w, c = x.shape
        xf = x.reshape(B, -1, 4, c // 4)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - mean ** 2
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-4)).reshape(x.shape)
        return xn * g + b

    got = jax.grad(lambda *a: jnp.sum(jnp.sin(
        norms.group_norm(*a, 4, 1e-4, True))), argnums=(0, 1, 2))(xg, gg, bg)
    want = jax.grad(lambda *a: jnp.sum(jnp.sin(gn_ref(*a))),
                    argnums=(0, 1, 2))(xg, gg, bg)
    for a, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)
