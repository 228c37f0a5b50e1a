"""Byte-level BPE tokenizer with MERLOT's special-token layout.

Token-id semantics must be **bit-identical** to the reference
(reference: utils/encode/encoder.py:14-73) because ids feed checkpoints:

  * the standard GPT-2 byte-level BPE vocabulary, with every GPT-2 id
    offset by **+100** to reserve special-token space;
  * PADDING=0, MASK=1, START=2, END=3, NEXTCAPTION_TIME=4,
    NEXTCAPTION_START=5, NEXTCAPTION_END=6; ids 10..99 are ``<|unusedN|>``;
  * anything with id < 100 is "special" (never masked, never sampled as a
    random replacement token);
  * model vocab_size is padded up to 50370 (50257 + 100 = 50357 real ids,
    rounded up for TPU-friendly table shapes).

The BPE merge procedure is the canonical public GPT-2 algorithm; the
vocabulary data files in merlot_tpu/assets are the public GPT-2 artifacts.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, Iterable, List, Tuple

import regex as re

# Special token ids (id < 100 is "special")
PADDING = 0
MASK = 1
START = 2
END = 3
NEXTCAPTION_TIME = 4
NEXTCAPTION_START = 5
NEXTCAPTION_END = 6

SPECIAL_TOKEN_CUTOFF = 100  # ids below this are special / reserved
GPT2_OFFSET = 100

_ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")

# GPT-2's pretokenization pattern (public; splits contractions, letter runs,
# digit runs, punctuation runs, and whitespace).
_GPT2_SPLIT_PATTERN = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """The public GPT-2 reversible byte<->unicode table.

    Maps each of the 256 byte values to a printable unicode char so BPE can
    operate on unicode strings without collapsing whitespace/control bytes.
    """
    printable = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    mapping: Dict[int, str] = {b: chr(b) for b in printable}
    shift = 0
    for b in range(256):
        if b not in mapping:
            mapping[b] = chr(256 + shift)
            shift += 1
    return mapping


def _load_vocab_assets(vocab_dir: str) -> Tuple[Dict[str, int], List[Tuple[str, str]]]:
    enc_path = os.path.join(vocab_dir, "gpt2_encoder.json")
    bpe_path = os.path.join(vocab_dir, "gpt2_vocab.bpe")
    with open(enc_path, "r") as f:
        gpt2_vocab = json.load(f)
    with open(bpe_path, "r", encoding="utf-8") as f:
        lines = f.read().split("\n")
    # first line is a version header, last is empty
    merges = [tuple(line.split()) for line in lines[1:-1]]
    return gpt2_vocab, merges


class Tokenizer:
    """GPT-2 byte-level BPE, ids offset by +100, MERLOT special tokens."""

    def __init__(self, gpt2_vocab: Dict[str, int],
                 merges: Iterable[Tuple[str, str]], errors: str = "replace"):
        self.encoder: Dict[str, int] = {k: v + GPT2_OFFSET for k, v in gpt2_vocab.items()}
        self.encoder.update({f"<|unused{i}|>": i for i in range(10, SPECIAL_TOKEN_CUTOFF)})
        self.encoder.update({
            "<|PADDING|>": PADDING,
            "<|MASK|>": MASK,
            "<|START|>": START,
            "<|END|>": END,
            "<|NEXTCAPTION_TIME|>": NEXTCAPTION_TIME,
            "<|NEXTCAPTION_START|>": NEXTCAPTION_START,
            "<|NEXTCAPTION_END|>": NEXTCAPTION_END,
        })
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.errors = errors
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.merge_rank: Dict[Tuple[str, str], int] = {
            pair: rank for rank, pair in enumerate(merges)
        }
        self._bpe_cache: Dict[str, Tuple[str, ...]] = {}
        self._pretok = re.compile(_GPT2_SPLIT_PATTERN)

    # ------------------------------------------------------------------
    def _bpe(self, token: str) -> Tuple[str, ...]:
        """Apply BPE merges to one pretokenized chunk (already byte-mapped)."""
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached

        parts: List[str] = list(token)
        while len(parts) > 1:
            # find the lowest-rank adjacent pair
            best_rank = None
            best_i = -1
            for i in range(len(parts) - 1):
                rank = self.merge_rank.get((parts[i], parts[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank = rank
                    best_i = i
            if best_rank is None:
                break
            first, second = parts[best_i], parts[best_i + 1]
            # merge EVERY adjacent occurrence of (first, second), left to right
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == first and parts[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged

        result = tuple(parts)
        self._bpe_cache[token] = result
        return result

    # ------------------------------------------------------------------
    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for chunk in self._pretok.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in chunk.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self._bpe(mapped))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors=self.errors)

    def __len__(self) -> int:
        return len(self.encoder)

    @property
    def padded_vocab_size(self) -> int:
        """Model-facing vocab size (reference config uses 50370)."""
        return 50370


def get_tokenizer(vocab_dir: str | None = None) -> Tokenizer:
    """Load the tokenizer from the packaged GPT-2 vocabulary assets.

    Resolution order: explicit arg > $MERLOT_TPU_VOCAB_DIR > packaged assets.
    """
    vocab_dir = vocab_dir or os.environ.get("MERLOT_TPU_VOCAB_DIR") or _ASSETS_DIR
    gpt2_vocab, merges = _load_vocab_assets(vocab_dir)
    return Tokenizer(gpt2_vocab, merges)


class GroverTokenizer(Tokenizer):
    """The Grover denoiser's vocabulary layout on the same GPT-2 merges
    (reference: data/groverdenoise/sample/encoder.py:53-77):

      * every GPT-2 id offset by +1, ``<|padding|>`` = 0;
      * ``<|endoftext|>`` removed;
      * paired begin/end specials for domain/date/authors/title/article/
        summary appended from id 50257 up, then ``<|resetcontext|>`` —
        total vocab 50270 (matches lm/configs/medium.json).
    """

    SPECIAL_FIELDS = ("domain", "date", "authors", "title", "article", "summary")

    def __init__(self, gpt2_vocab, merges, errors: str = "replace"):
        # bypass Tokenizer.__init__'s +100 layout; rebuild with +1
        self.encoder = {k: v + 1 for k, v in gpt2_vocab.items()}
        self.encoder["<|padding|>"] = 0
        self.padding = 0
        del self.encoder["<|endoftext|>"]
        for field_name in self.SPECIAL_FIELDS:
            setattr(self, f"begin_{field_name}", len(self.encoder))
            self.encoder[f"<|begin{field_name}|>"] = len(self.encoder)
            setattr(self, f"end_{field_name}", len(self.encoder))
            self.encoder[f"<|endof{field_name}|>"] = len(self.encoder)
        self.reset_context = len(self.encoder)
        self.encoder["<|resetcontext|>"] = len(self.encoder)

        self.decoder = {v: k for k, v in self.encoder.items()}
        self.errors = errors
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.merge_rank = {pair: rank for rank, pair in enumerate(merges)}
        self._bpe_cache = {}
        self._pretok = re.compile(_GPT2_SPLIT_PATTERN)

    @property
    def padded_vocab_size(self) -> int:
        return len(self.encoder)

    @property
    def special_tokens_onehot(self):
        """1 for every id that is a special token (padding + appended)."""
        return [1 if (tok.startswith("<|") and tok.endswith("|>")) else 0
                for tok, i in sorted(self.encoder.items(), key=lambda kv: kv[1])]


def get_grover_tokenizer(vocab_dir: str | None = None) -> GroverTokenizer:
    vocab_dir = vocab_dir or os.environ.get("MERLOT_TPU_VOCAB_DIR") or _ASSETS_DIR
    gpt2_vocab, merges = _load_vocab_assets(vocab_dir)
    return GroverTokenizer(gpt2_vocab, merges)
