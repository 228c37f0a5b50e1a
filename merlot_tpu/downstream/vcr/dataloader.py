"""VCR dataloaders (numpy host pipeline).

Parity targets (reference):
  * joint train loader (downstream/vcr/dataloader_joint.py): per example
    both the answer- AND rationale-mode images and all 4 choices each;
    sequences are ``[START prompt] ctx choice END`` padded to 184 tokens with
    prompts ' answer question:' / ' provide rationale:'; the batch flattens
    to images [b*2, h, w, 3], lm_input [b*2*4, 184], lm_targets [b*2].
  * eval loader (downstream/vcr/dataloader.py): one mode only; lm_input
    stays [b, 4, 184] (the model_fn flattens).
Images use the ``draw`` config ('segm' or 'bbox') variant, resize_and_pad
with random scale [0.9, 1.1] in training.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from merlot_tpu.core.tokenizer import END, PADDING, START, get_tokenizer
from merlot_tpu.data import image_ops
from merlot_tpu.data.pretrain_loader import shard_files, shuffle_records
from merlot_tpu.data.tfrecord import parse_example, read_tfrecords

MAX_NUM_TOKENS = 184

_PROMPTS = None


def vcr_prompts() -> Dict[str, List[int]]:
    global _PROMPTS
    if _PROMPTS is None:
        tok = get_tokenizer()
        _PROMPTS = {
            "answer": [START] + tok.encode(" answer question:"),
            "rationale": [START] + tok.encode(" provide rationale:"),
        }
    return _PROMPTS


def _sequence(prompt: List[int], ctx: np.ndarray, choice: np.ndarray
              ) -> np.ndarray:
    seq = np.concatenate([np.asarray(prompt, np.int32),
                          np.asarray(ctx, np.int32),
                          np.asarray(choice, np.int32),
                          [END]])[:MAX_NUM_TOKENS]
    out = np.full(MAX_NUM_TOKENS, PADDING, np.int32)
    out[:len(seq)] = seq
    return out


def _decode_image(ex, mode: str, draw: str, image_size, rng, is_training):
    img = image_ops.decode_jpeg_u8(ex[f"{mode}/{draw}/image/encoded"][0])
    if is_training:
        img, _ = image_ops.resize_and_pad(img, image_size, rng=rng,
                                          do_random_scale=True,
                                          random_scale_min=0.9,
                                          random_scale_max=1.1)
    else:
        img, _ = image_ops.resize_and_pad(img, image_size)
    return img.astype(np.float32)


def parse_vcr_joint(payload: bytes, config: Dict[str, Any],
                    rng: np.random.Generator,
                    is_training: bool = True) -> Dict[str, np.ndarray]:
    draw = config.get("draw", "segm")
    ex = parse_example(payload)
    prompts = vcr_prompts()

    images = np.stack([
        _decode_image(ex, m, draw, config["image_size"], rng, is_training)
        for m in ("answer", "rationale")])
    lm_input = np.stack([
        np.stack([_sequence(prompts[m], ex[f"{m}/ctx"],
                            ex[f"{m}/choice_{i}"]) for i in range(4)])
        for m in ("answer", "rationale")])                       # [2, 4, 184]
    lm_targets = np.array([int(ex["label/answer_label"][0]),
                           int(ex["label/rationale_label"][0])], np.int32)
    return {"images": images, "lm_input": lm_input, "lm_targets": lm_targets,
            "annot_id": ex["annot_id"][0]}


def parse_vcr_single(payload: bytes, config: Dict[str, Any],
                     mode: str) -> Dict[str, np.ndarray]:
    draw = config.get("draw", "segm")
    ex = parse_example(payload)
    prompts = vcr_prompts()
    image = _decode_image(ex, mode, draw, config["image_size"], None, False)
    lm_input = np.stack([_sequence(prompts[mode], ex[f"{mode}/ctx"],
                                   ex[f"{mode}/choice_{i}"])
                         for i in range(4)])                      # [4, 184]
    return {"images": image, "lm_input": lm_input,
            "lm_targets": np.int32(ex[f"label/{mode}_label"][0]),
            "annot_id": ex["annot_id"][0]}


def vcr_joint_batches(files: Sequence[str], config: Dict[str, Any],
                      batch_size: int, is_training: bool = True,
                      seed: int = 0, repeat: Optional[bool] = None
                      ) -> Iterator[Dict[str, np.ndarray]]:
    """Training batches, flattened like the reference's _process_example.

    In training, raw records pass through a record-level shuffle buffer
    (config ``shuffle_buffer_size``, default 64 — the reference's
    dataset.shuffle at dataloader_joint.py:249-251) on top of the epoch
    file-order shuffle, so examples within a shard arrive in a different
    order every epoch."""
    rng = np.random.default_rng(seed)
    files = shard_files(files, shuffle=is_training, seed=seed)
    repeat = is_training if repeat is None else repeat
    buffer_size = config.get("shuffle_buffer_size", 64) if is_training else 0

    def records() -> Iterator[bytes]:
        for f in files:
            yield from read_tfrecords(f)

    buf: List[Dict[str, np.ndarray]] = []
    while True:
        if is_training:          # fresh file order every epoch, like
            rng.shuffle(files)   # tf.data's reshuffle_each_iteration
        for rec in shuffle_records(records(), buffer_size, rng):
            buf.append(parse_vcr_joint(rec, config, rng, is_training))
            if len(buf) < batch_size:
                continue
            b = {k: np.stack([e[k] for e in buf]) for k in
                 ("images", "lm_input", "lm_targets")}
            buf = []
            bs = batch_size
            h, w = config["image_size"]
            yield {
                "images": b["images"].reshape(bs * 2, h, w, 3),
                "lm_input": b["lm_input"].reshape(bs * 2 * 4, MAX_NUM_TOKENS),
                "lm_targets": b["lm_targets"].reshape(bs * 2),
            }
        if not repeat:
            return


def vcr_eval_batches(files: Sequence[str], config: Dict[str, Any],
                     batch_size: int, mode: str = "answer"
                     ) -> Iterator[Dict[str, np.ndarray]]:
    buf: List[Dict[str, np.ndarray]] = []
    for f in shard_files(files):
        for rec in read_tfrecords(f):
            buf.append(parse_vcr_single(rec, config, mode))
            if len(buf) == batch_size:
                yield {k: (np.stack([e[k] for e in buf])
                           if k != "annot_id" else [e[k] for e in buf])
                       for k in buf[0]}
                buf = []
