"""Grover LM dataloaders (denoiser training).

Parity target: data/groverdenoise/lm/dataloader.py (reference): fixed-length
``input_ids`` [seq_length+1] tfrecord examples for LM training (:41-87), and
a classification variant with ``input_ids``/``label_ids``/``is_real_example``
(:131-161). Both become simple numpy batch iterators here.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from merlot_tpu.data.pretrain_loader import shard_files
from merlot_tpu.data.tfrecord import (TFRecordWriter, encode_example,
                                      parse_example, read_tfrecords)


def write_lm_shard(path: str, sequences: Sequence[Sequence[int]],
                   seq_length: int, pad_id: int = 0,
                   is_target: Optional[Sequence[Sequence[int]]] = None) -> int:
    """Write fixed-length LM examples ([seq_length+1] ids, optional target
    mask for the denoise bonus weighting)."""
    n = 0
    with TFRecordWriter(path) as w:
        for i, seq in enumerate(sequences):
            ids = np.full(seq_length + 1, pad_id, np.int64)
            ids[:min(len(seq), seq_length + 1)] = seq[:seq_length + 1]
            feats: Dict[str, Any] = {"input_ids": list(ids)}
            if is_target is not None:
                t = np.zeros(seq_length + 1, np.int64)
                t[:min(len(is_target[i]), seq_length + 1)] = \
                    is_target[i][:seq_length + 1]
                feats["is_target"] = list(t)
            w.write(encode_example(feats))
            n += 1
    return n


def write_classification_shard(path: str, sequences: Sequence[Sequence[int]],
                               labels: Sequence[int], seq_length: int,
                               pad_id: int = 0) -> int:
    """Classification examples: input_ids [seq_length], label_ids,
    is_real_example (reference: lm/dataloader.py:131-161)."""
    n = 0
    with TFRecordWriter(path) as w:
        for seq, label in zip(sequences, labels):
            ids = np.full(seq_length, pad_id, np.int64)
            ids[:min(len(seq), seq_length)] = seq[:seq_length]
            w.write(encode_example({"input_ids": list(ids),
                                    "label_ids": [int(label)],
                                    "is_real_example": [1]}))
            n += 1
    return n


def classification_batches(files: Sequence[str], seq_length: int,
                           batch_size: int, is_training: bool = True,
                           seed: int = 0, repeat: Optional[bool] = None
                           ) -> Iterator[Dict[str, np.ndarray]]:
    """Batches of {'input_ids', 'label_ids', 'is_real_example'} — pool with
    merlot_tpu.models.grover.pooled_hidden for the classifier head."""
    files = shard_files(files, shuffle=is_training, seed=seed)
    repeat = is_training if repeat is None else repeat
    buf: List[Dict[str, np.ndarray]] = []
    while True:
        for f in files:
            for rec in read_tfrecords(f):
                ex = parse_example(rec)
                buf.append({
                    "input_ids": np.asarray(ex["input_ids"], np.int32),
                    "label_ids": np.int32(ex["label_ids"][0]),
                    "is_real_example": np.int32(ex["is_real_example"][0]),
                })
                assert buf[-1]["input_ids"].shape == (seq_length,)
                if len(buf) == batch_size:
                    yield {k: np.stack([e[k] for e in buf]) for k in buf[0]}
                    buf = []
        if not repeat:
            return


def lm_batches(files: Sequence[str], seq_length: int, batch_size: int,
               is_training: bool = True, seed: int = 0,
               repeat: Optional[bool] = None) -> Iterator[Dict[str, np.ndarray]]:
    """Yield {'input_ids' [b, seq+1], 'is_target' [b, seq+1]} batches."""
    files = shard_files(files, shuffle=is_training, seed=seed)
    repeat = is_training if repeat is None else repeat
    buf: List[Dict[str, np.ndarray]] = []
    while True:
        for f in files:
            for rec in read_tfrecords(f):
                ex = parse_example(rec)
                item = {"input_ids": np.asarray(ex["input_ids"], np.int32)}
                item["is_target"] = (np.asarray(ex["is_target"], np.int32)
                                     if "is_target" in ex
                                     else np.zeros_like(item["input_ids"]))
                assert item["input_ids"].shape == (seq_length + 1,)
                buf.append(item)
                if len(buf) == batch_size:
                    yield {k: np.stack([e[k] for e in buf]) for k in buf[0]}
                    buf = []
        if not repeat:
            return
