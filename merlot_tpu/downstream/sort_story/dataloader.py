"""sort_story eval loader: 5 images + 5 sentences per story.

Parity target: downstream/sort_story/dataloader.py (reference). No random
scale, no augmentation; sentences are START-prefixed and padded to 32
tokens; images resize_and_pad'ed to config image_size.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Sequence

import numpy as np

from merlot_tpu.core.tokenizer import PADDING, START
from merlot_tpu.data import image_ops
from merlot_tpu.data.pretrain_loader import shard_files, shuffle_records
from merlot_tpu.data.tfrecord import parse_example, read_tfrecords

MAX_NUM_TOKENS = 32


def parse_story_example(payload: bytes, config: Dict[str, Any]
                        ) -> Dict[str, np.ndarray]:
    num_chunks = config["num_chunks"]
    image_size = config["image_size"]
    ex = parse_example(payload)

    images = np.zeros((num_chunks, image_size[0], image_size[1], 3), np.float32)
    sentences = np.full((num_chunks, MAX_NUM_TOKENS), PADDING, np.int32)
    for i in range(num_chunks):
        img = image_ops.decode_jpeg_u8(ex[f"image/image_{i}_encoded"][0])
        img, _ = image_ops.resize_and_pad(img, image_size)
        images[i] = img
        toks = np.asarray(ex[f"sentence/sentence_{i}"], np.int32)[:MAX_NUM_TOKENS - 1]
        sentences[i, 0] = START
        sentences[i, 1:1 + len(toks)] = toks

    return {
        "images": images,
        "sentences": sentences,
        "story_id": np.int64(ex["story_id"][0]),
        "permutation_identity_encode": np.int64(
            ex["permutation_identity_encode"][0]),
    }


def story_batches(files: Sequence[str], config: Dict[str, Any],
                  batch_size: int, is_training: bool = False,
                  seed: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Story batches (drop_remainder, like the reference's fixed-size TPU
    batches — eval shards are pre-padded with replicas).

    Eval (default) is strictly sequential so permutation scoring sees a
    stable order. Training shuffles file order and passes records through
    a record-level shuffle buffer (config ``shuffle_buffer_size``, default
    64 — reference downstream/sort_story/dataloader.py:160-167)."""
    rng = np.random.default_rng(seed)
    sharded = shard_files(files, shuffle=is_training, seed=seed)
    buffer_size = (config.get("shuffle_buffer_size", 64)
                   if is_training else 0)

    def records() -> Iterator[bytes]:
        for f in sharded:
            yield from read_tfrecords(f)

    buf: List[Dict[str, np.ndarray]] = []
    for rec in shuffle_records(records(), buffer_size, rng):
        buf.append(parse_story_example(rec, config))
        if len(buf) == batch_size:
            yield {k: np.stack([e[k] for e in buf]) for k in buf[0]}
            buf = []
