"""Tokenizer parity: ids must be bit-identical to the reference encoder.

The reference encoder (utils/encode/encoder.py) is pure Python (regex+numpy
only), so when the reference tree is present we import it directly as a
golden oracle. Otherwise we check the invariants.
"""

import importlib.util
import os
import sys

import pytest

from merlot_tpu.core.tokenizer import (END, MASK, PADDING, START,
                                       get_tokenizer)

REFERENCE_ENCODER = "/root/reference/utils/encode/encoder.py"

SAMPLES = [
    "hello world",
    "The quick brown fox jumped over the lazy dog!!",
    "I'll've been there 1234 times... naïve café — ünïcödé 😀 test",
    "  leading spaces\tand\ttabs\nnewlines  ",
    "don't DON'T Don't",
    "1+1=2; x_9 == y[3]?",
    "",
]


def _load_reference_encoder():
    spec = importlib.util.spec_from_file_location("ref_encoder", REFERENCE_ENCODER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref_dir = os.path.dirname(REFERENCE_ENCODER)
    import json
    with open(os.path.join(ref_dir, "encoder.json")) as f:
        enc = json.load(f)
    with open(os.path.join(ref_dir, "vocab.bpe"), encoding="utf-8") as f:
        merges = [tuple(l.split()) for l in f.read().split("\n")[1:-1]]
    return mod.Encoder(encoder=enc, bpe_merges=merges)


def test_special_token_layout():
    tok = get_tokenizer()
    assert (PADDING, MASK, START, END) == (0, 1, 2, 3)
    assert tok.encoder["<|MASK|>"] == 1
    assert tok.encoder["<|unused42|>"] == 42
    assert min(v for k, v in tok.encoder.items() if not k.startswith("<|")) >= 100
    assert tok.padded_vocab_size == 50370
    assert max(tok.encoder.values()) < tok.padded_vocab_size


def test_roundtrip():
    tok = get_tokenizer()
    for s in SAMPLES:
        ids = tok.encode(s)
        assert all(i >= 100 for i in ids)
        assert tok.decode(ids) == s


@pytest.mark.skipif(not os.path.exists(REFERENCE_ENCODER),
                    reason="reference tree not mounted")
def test_ids_match_reference_encoder():
    ref = _load_reference_encoder()
    tok = get_tokenizer()
    texts = SAMPLES + [
        "so today we're going to show you how to make a really simple pasta",
        "MERLOT: Multimodal Neural Script Knowledge Models",
    ]
    for s in texts:
        assert tok.encode(s) == ref.encode(s), s
