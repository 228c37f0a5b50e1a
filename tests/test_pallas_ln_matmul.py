"""Fused LN+matmul kernel vs the unfused reference math (interpret mode on
CPU; the same code runs compiled on TPU), plus the transformer integration
contract: identical param tree, bit-identical fallback, gradient parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_tpu.ops.pallas_ln_matmul as plm
from merlot_tpu.nn.transformer import TransformerEncoder, TransformerHParams
from merlot_tpu.ops import norms


@pytest.fixture
def interpret():
    plm.INTERPRET = True
    yield
    plm.INTERPRET = False


def _ref(x, gamma, beta, ws, bs):
    z = norms.layer_norm(x, gamma, beta, 1e-5)
    return [jnp.dot(z, w.astype(x.dtype), preferred_element_type=x.dtype)
            + b.astype(x.dtype) for w, b in zip(ws, bs)]


@pytest.mark.parametrize("m,k,n,j", [(256, 256, 384, 3), (96, 128, 256, 1)])
def test_kernel_matches_unfused(rng, interpret, m, k, n, j):
    x = jnp.asarray(rng.normal(0, 1, (2, m // 2, k)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, (k,)), jnp.float32)
    ws = [jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.float32)
          for _ in range(j)]
    bs = [jnp.asarray(rng.normal(0, 0.01, (n,)), jnp.float32)
          for _ in range(j)]
    assert plm.kernel_supported(m, k, n, 4) is not None
    ys = plm.ln_matmul(x, gamma, beta, ws, bs)
    refs = _ref(x, gamma, beta, ws, bs)
    for y, r in zip(ys, refs):
        np.testing.assert_allclose(np.asarray(y), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def test_kernel_bf16(rng, interpret):
    """bf16 activations (the training dtype): kernel matches the unfused
    DenseTN math to bf16 rounding."""
    m, k, n = 128, 128, 128
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, (k,)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.01, (n,)), jnp.float32)
    (y,) = plm.ln_matmul(x, gamma, beta, (w,), (b,))
    assert y.dtype == jnp.bfloat16
    (r,) = _ref(x, gamma, beta, [w], [b])
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(r, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_gradients_match_unfused(rng, interpret):
    m, k, n, j = 128, 128, 256, 2
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.float32)
    gamma = jnp.asarray(rng.normal(1, 0.1, (k,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.1, (k,)), jnp.float32)
    ws = tuple(jnp.asarray(rng.normal(0, 0.02, (k, n)), jnp.float32)
               for _ in range(j))
    bs = tuple(jnp.asarray(rng.normal(0, 0.01, (n,)), jnp.float32)
               for _ in range(j))

    def fused(x, gamma, beta, ws, bs):
        return sum(jnp.sum(jnp.sin(y))
                   for y in plm.ln_matmul(x, gamma, beta, ws, bs))

    def ref(x, gamma, beta, ws, bs):
        return sum(jnp.sum(jnp.sin(y))
                   for y in _ref(x, gamma, beta, ws, bs))

    gf = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, ws, bs)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_unsupported_shape_falls_back(rng):
    """Odd M (no block divisor) and K%128!=0 both take the unfused path —
    which is bit-identical to the module math by construction."""
    assert plm.kernel_supported(100, 256, 256, 4) is None   # M=100: no blk
    assert plm.kernel_supported(256, 200, 256, 4) is None   # K not /128
    x = jnp.asarray(rng.normal(0, 1, (25, 4, 256)), jnp.float32)  # M=100
    gamma = jnp.ones((256,), jnp.float32)
    beta = jnp.zeros((256,), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.02, (256, 256)), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)
    (y,) = plm.ln_matmul(x, gamma, beta, (w,), (b,))
    (r,) = _ref(x, gamma, beta, [w], [b])
    assert bool(jnp.all(y == r))


def _enc_pair(fuse):
    hp = TransformerHParams(hidden_size=128, num_layers=2, num_heads=4,
                            intermediate_size=256, hidden_dropout_prob=0.0,
                            dtype=jnp.float32, softmax_fp32=True,
                            fuse_ln_matmul=fuse)
    return TransformerEncoder(hp)


def test_encoder_fused_parity(rng, interpret):
    """Full encoder with fuse_ln_matmul: same param tree as unfused, same
    hidden states, same grads (the checkpoint/sharding contract)."""
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 128)), jnp.float32)
    mask = jnp.ones((2, 32, 32), jnp.float32)
    enc0, encf = _enc_pair(False), _enc_pair(True)
    v = enc0.init(jax.random.PRNGKey(0), x, mask)
    vf = encf.init(jax.random.PRNGKey(0), x, mask)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(vf))

    y0 = enc0.apply(v, x, mask)["hidden_state"]
    y1 = encf.apply(v, x, mask)["hidden_state"]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)

    def loss(enc, v, x):
        return jnp.sum(enc.apply(v, x, mask)["hidden_state"] ** 2)

    g0 = jax.grad(lambda v: loss(enc0, v, x))(v)
    g1 = jax.grad(lambda v: loss(encf, v, x))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_encoder_fallback_bit_identical(rng):
    """Off-TPU with no interpreter, fuse_ln_matmul must change NOTHING."""
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 128)), jnp.float32)
    mask = jnp.ones((2, 16, 16), jnp.float32)
    enc0, encf = _enc_pair(False), _enc_pair(True)
    v = enc0.init(jax.random.PRNGKey(0), x, mask)
    y0 = enc0.apply(v, x, mask)["hidden_state"]
    y1 = encf.apply(v, x, mask)["hidden_state"]
    assert bool(jnp.all(y0 == y1))


def test_fused_skips_cache_and_cross_attention(rng):
    """KV-cache decode with fuse_ln_matmul on still matches the full
    forward (fusion silently disabled on cached calls)."""
    hp = TransformerHParams(hidden_size=64, num_layers=2, num_heads=2,
                            intermediate_size=128, hidden_dropout_prob=0.0,
                            dtype=jnp.float32, fuse_ln_matmul=True)
    enc = TransformerEncoder(hp)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 64)), jnp.float32)
    mask = (jnp.arange(8)[None, None, :]
            <= jnp.arange(8)[None, :, None]).astype(jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), x, mask)
    full = enc.apply(v, x, mask)["hidden_state"]

    cache = enc.init_cache(1, 8, dtype=jnp.float32)
    # prefill positions one by one through the cache
    outs = []
    for t in range(8):
        step_mask = mask[:, t:t + 1]
        out = enc.apply(v, x[:, t:t + 1], step_mask, cache=cache,
                        cache_pos=t)
        cache = out["new_cache"]
        outs.append(out["hidden_state"])
    dec = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full),
                               rtol=1e-4, atol=1e-4)
