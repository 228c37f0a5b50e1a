"""Pallas flash-attention kernel vs the XLA oracle (interpret mode on CPU;
the same comparison runs on the real chip via tools/check_pallas_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from merlot_tpu.ops.attention import _xla_attention
from merlot_tpu.ops.pallas_attention import flash_attention


@pytest.mark.parametrize("s,collect", [(20, "none"), (20, "colsum"),
                                       (160, "colsum"), (300, "none")])
def test_flash_matches_xla_interpret(rng, s, collect):
    B, H, D = 2, 3, 16
    q = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    valid = rng.integers(0, 2, (B, s)).astype(bool)
    valid[:, 0] = True
    mask = jnp.asarray((valid[:, None] & valid[:, :, None]), jnp.float32)

    ctx_ref, extra_ref = _xla_attention(q, k, v, mask, collect=collect)
    with pltpu.force_tpu_interpret_mode():
        ctx, extra = flash_attention(q, k, v, mask, collect=collect)

    # fully-masked (invalid) query rows differ by design: the reference
    # softmaxes them to uniform over S keys, the padded kernel over S_pad.
    # Those rows are never consumed by any loss (pad positions only).
    vr = np.where(valid)
    np.testing.assert_allclose(np.asarray(ctx)[vr[0], vr[1]],
                               np.asarray(ctx_ref)[vr[0], vr[1]],
                               rtol=2e-4, atol=2e-4)
    if collect == "colsum":
        # colsum over VALID-query contributions must match: subtract the
        # uniform mass the invalid rows contribute in each formulation.
        n_invalid = (~valid).sum(1)
        s_pad = ((s + 127) // 128) * 128
        ref_adj = np.asarray(extra_ref) - n_invalid[:, None] / s
        pal_adj = np.asarray(extra) - n_invalid[:, None] / s_pad
        np.testing.assert_allclose(pal_adj, ref_adj, rtol=2e-4, atol=2e-4)


def test_flash_no_mask_matches_xla(rng):
    B, s, H, D = 2, 24, 2, 16
    q = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    ctx_ref, _ = _xla_attention(q, k, v, None, collect="none")
    with pltpu.force_tpu_interpret_mode():
        ctx, _ = flash_attention(q, k, v, None, collect="none")
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_gradients_match_xla(rng):
    B, s, H, D = 1, 12, 2, 8
    q = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, s, H, D)), jnp.float32)
    mask = jnp.ones((B, s, s), jnp.float32)

    def loss_ref(q, k, v):
        ctx, colsum = _xla_attention(q, k, v, mask, collect="colsum")
        return jnp.sum(ctx ** 2) + jnp.sum(colsum ** 2)

    def loss_pallas(q, k, v):
        ctx, colsum = flash_attention(q, k, v, mask, collect="colsum")
        return jnp.sum(ctx ** 2) + jnp.sum(colsum ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
