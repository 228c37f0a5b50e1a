"""Distributional checks of attention-guided SpanBERT masking.

RNG streams differ from TF by construction, so parity is statistical: the
masked-count invariant, the 80/10/10 corruption split, span clustering with
EV ~2 extension, the top-attention bias (choose_topk_prob), and the
special-token exclusion (reference: model/modeling.py:381-489)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_tpu.ops.masking import attention_guided_span_mask

L = 128
B = 64
VOCAB = 50370


def _run(rng_seed, ids, attn_mass, **kw):
    return attention_guided_span_mask(
        jax.random.PRNGKey(rng_seed), jnp.asarray(ids), attn_mass,
        vocab_size=VOCAB, **kw)


def test_masked_count_and_sorted(rng):
    ids = rng.integers(100, VOCAB, (B, L)).astype(np.int32)
    masked, idx = _run(0, ids, jnp.ones((B, L)))
    idx = np.asarray(idx)
    assert idx.shape == (B, int(L * 0.2))
    assert (np.diff(idx, axis=1) >= 0).all()  # sorted
    assert (idx >= 0).all() and (idx < L).all()


def test_corruption_split_80_10_10(rng):
    ids = rng.integers(100, VOCAB, (B, L)).astype(np.int32)
    masked, idx = _run(1, ids, jnp.ones((B, L)))
    masked = np.asarray(masked)
    sel = np.zeros((B, L), bool)
    np.put_along_axis(sel, np.asarray(idx), True, axis=1)
    chosen_orig = ids[sel]
    chosen_new = masked[sel]
    frac_mask = (chosen_new == 1).mean()
    frac_keep = (chosen_new == chosen_orig).mean()
    frac_rand = 1 - frac_mask - frac_keep
    assert 0.74 < frac_mask < 0.86
    assert 0.06 < frac_keep < 0.15
    assert 0.05 < frac_rand < 0.15
    # non-selected positions untouched
    assert (masked[~sel] == ids[~sel]).all()


def test_special_tokens_never_masked(rng):
    ids = rng.integers(100, VOCAB, (B, L)).astype(np.int32)
    ids[:, ::4] = rng.integers(0, 100, (B, L // 4 + (L % 4 > 0)))[:, :len(ids[0, ::4])]
    masked, idx = _run(2, ids, jnp.ones((B, L)))
    sel = np.zeros((B, L), bool)
    np.put_along_axis(sel, np.asarray(idx), True, axis=1)
    assert not (sel & (ids < 100)).any()


def test_spans_cluster(rng):
    """SpanBERT extension: masked positions form runs (mean run length > 1.3,
    vs ~1.05 for independent draws at rate 0.2)."""
    ids = rng.integers(100, VOCAB, (B, L)).astype(np.int32)
    _, idx = _run(3, ids, jnp.ones((B, L)))
    runs = []
    for row in np.asarray(idx):
        row = np.unique(row)
        breaks = np.where(np.diff(row) > 1)[0]
        lengths = np.diff(np.concatenate([[-1], breaks, [len(row) - 1]]))
        runs.extend(lengths)
    assert np.mean(runs) > 1.3
    _, idx_nospan = _run(3, ids, jnp.ones((B, L)), do_spanbert=False)
    runs2 = []
    for row in np.asarray(idx_nospan):
        row = np.unique(row)
        breaks = np.where(np.diff(row) > 1)[0]
        runs2.extend(np.diff(np.concatenate([[-1], breaks, [len(row) - 1]])))
    assert np.mean(runs) > np.mean(runs2)


def test_attention_bias(rng):
    """Tokens in the attention top-20% get masked ~choose_topk_prob of the
    mass (calibrated weights, reference: modeling.py:413-419)."""
    ids = rng.integers(100, VOCAB, (B, L)).astype(np.int32)
    mass = np.zeros((B, L), np.float32)
    hot = rng.integers(0, L, (B, int(L * 0.2)))
    np.put_along_axis(mass, hot, 10.0, axis=1)
    mass += rng.uniform(0, 0.1, (B, L)).astype(np.float32)

    frac_hot = []
    for seed in range(5):
        _, idx = _run(seed, ids, jnp.asarray(mass))
        sel = np.zeros((B, L), bool)
        np.put_along_axis(sel, np.asarray(idx), True, axis=1)
        is_hot = np.zeros((B, L), bool)
        np.put_along_axis(is_hot, hot, True, axis=1)
        frac_hot.append((sel & is_hot).sum() / sel.sum())
    frac = np.mean(frac_hot)
    # Anchors land in the top set ~39% (without-replacement depletion of the
    # 25-slot top set); span extension dilutes the final positions to ~29%.
    # A uniform sampler sits near 18-20%.
    assert 0.25 < frac < 0.65

    _, idx_flat = _run(0, ids, None, use_attn=False)
    sel = np.zeros((B, L), bool)
    np.put_along_axis(sel, np.asarray(idx_flat), True, axis=1)
    is_hot = np.zeros((B, L), bool)
    np.put_along_axis(is_hot, hot, True, axis=1)
    frac_uniform = (sel & is_hot).sum() / sel.sum()
    assert frac > frac_uniform + 0.05
