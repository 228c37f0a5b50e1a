"""Generate synthetic pretrain tfrecords in the reference schema.

Produces shards whose per-chunk feature keys exactly match the reference
writer (data/process.py:234-263): ``c{i:02d}/image/encoded``,
``tokenized_cleaned_asr``, ``tokenized_raw_asr``, ``is_eoc``, ``mean_time``,
``chunk_num``, ``youtube_id``, etc. Used by tests and by bench runs that
exercise the full host pipeline without the (unreleasable) YT-Temporal data.
"""

from __future__ import annotations

import argparse
import io
import os
from typing import Optional

import numpy as np

from merlot_tpu.data.tfrecord import TFRecordWriter, encode_example


def _random_jpeg(rng: np.random.Generator, h: int, w: int) -> bytes:
    from PIL import Image
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=80)
    return buf.getvalue()


def write_synthetic_shard(path: str, num_examples: int = 4,
                          num_chunks: int = 16, seed: int = 0,
                          img_hw=(96, 160), max_tokens: int = 28) -> None:
    rng = np.random.default_rng(seed)
    with TFRecordWriter(path) as w:
        for ex_i in range(num_examples):
            features = {}
            # segments come in video blocks of random length, like real data
            boundaries = set()
            pos = 0
            while pos < num_chunks - 1:
                pos += int(rng.integers(2, 6))
                if pos < num_chunks:
                    boundaries.add(pos - 1)
            for i in range(num_chunks):
                pre = f"c{i:02d}/"
                n_tok = int(rng.integers(4, max_tokens))
                features[pre + "image/encoded"] = _random_jpeg(rng, *img_hw)
                features[pre + "image/format"] = b"jpeg"
                features[pre + "image/key/sha256"] = b""
                features[pre + "image/height"] = [img_hw[0]]
                features[pre + "image/width"] = [img_hw[1]]
                features[pre + "youtube_id"] = f"synthvid{ex_i:05d}".encode()
                features[pre + "tokenized_cleaned_asr"] = list(
                    rng.integers(100, 50357, n_tok))
                features[pre + "tokenized_raw_asr"] = list(
                    rng.integers(100, 50357, n_tok))
                features[pre + "is_eoc"] = [1 if i in boundaries else 0]
                features[pre + "mean_time"] = [float(i) * 5.0]
                features[pre + "chunk_num"] = [i]
            w.write(encode_example(features))


def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out_dir", default="/tmp/merlot_synth")
    ap.add_argument("--num_shards", type=int, default=2)
    ap.add_argument("--num_examples", type=int, default=4)
    ap.add_argument("--num_chunks", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    for s in range(args.num_shards):
        path = os.path.join(args.out_dir,
                            f"train-{s:05d}-of-{args.num_shards:05d}.tfrecord")
        write_synthetic_shard(path, args.num_examples, args.num_chunks,
                              seed=args.seed + s)
        print("wrote", path)


if __name__ == "__main__":
    main()
