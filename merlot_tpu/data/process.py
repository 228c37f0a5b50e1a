"""Offline pipeline: (video, ASR, denoised transcript) -> pretrain tfrecords.

Parity target: data/process.py (reference). Stages:
  1. subtitle cleanup: drop &...;-style artifacts, mojibake repair
     (reference: :95-110);
  2. description cleanup: emoji -> [name] placeholders, URL -> '%'
     (reference: :112-126);
  3. **DTW alignment** of raw ASR words to the Grover-denoised text with a
     banded edit-distance cost matrix (radius = max(10% of len, 32)); each
     ASR word collects the denoised words its path visits first
     (reference: :49-93);
  4. greedy chunking into <=31-token caption chunks that prefer to end at
     sentence boundaries once >=75% full (reference: :129-195);
  5. frame-at-mean-timestamp extraction + bicubic resize
     (shorter side 384, longer capped 512), buffered grouping into
     16-chunk examples, shuffled tfrecord writing (reference: :199-263).

Dependency notes: editdistance/tslearn/ftfy/demoji aren't in this image —
Levenshtein and the DTW path are implemented here (tiny DPs), ftfy/demoji
are used when importable with graceful fallbacks.
"""

from __future__ import annotations

import hashlib
import io
import random
import re
import string
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from merlot_tpu.core.tokenizer import get_tokenizer
from merlot_tpu.data.tfrecord import TFRecordWriter, encode_example

CHUNK_LEN = 31
STOP_THRESH = 0.75   # end a chunk early at sentence boundary once >=75% full
NUM_CHUNKS = 16

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)
_URL_RE = re.compile(
    r"""(?i)\b((?:https?://|www\d{0,3}[.]|[a-z0-9.\-]+[.][a-z]{2,4}/)"""
    r"""(?:[^\s()<>]+|\(([^\s()<>]+|(\([^\s()<>]+\)))*\))+"""
    r"""(?:\(([^\s()<>]+|(\([^\s()<>]+\)))*\)|[^\s`!()\[\]{};:'".,<>?«»“”‘’]))""")


# ----------------------------------------------------------------------
# small DPs: word edit distance + DTW path over a precomputed cost matrix
# ----------------------------------------------------------------------
def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance (chars)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def dtw_path(cost: np.ndarray) -> List[tuple]:
    """Monotone alignment path (0,0)->(n-1,m-1) minimizing summed cost with
    steps (i+1,j), (i,j+1), (i+1,j+1) — tslearn's dtw_path_from_metric
    ('precomputed') semantics."""
    n, m = cost.shape
    acc = np.full((n, m), np.inf, np.float64)
    acc[0, 0] = cost[0, 0]
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                continue
            best = np.inf
            if i > 0:
                best = min(best, acc[i - 1, j])
            if j > 0:
                best = min(best, acc[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, acc[i - 1, j - 1])
            acc[i, j] = cost[i, j] + best
    # backtrack
    path = [(n - 1, m - 1)]
    i, j = n - 1, m - 1
    while (i, j) != (0, 0):
        options = []
        if i > 0 and j > 0:
            options.append((acc[i - 1, j - 1], (i - 1, j - 1)))
        if i > 0:
            options.append((acc[i - 1, j], (i - 1, j)))
        if j > 0:
            options.append((acc[i, j - 1], (i, j - 1)))
        _, (i, j) = min(options, key=lambda x: x[0])
        path.append((i, j))
    return path[::-1]


def align_using_dtw(input_asr: Sequence[str], grover_output: Sequence[str],
                    radius_perc: float = 0.1, radius_abs: int = 32
                    ) -> List[str]:
    """Assign each raw-ASR word the denoised words its DTW path visits first
    (reference: :49-93)."""
    max_radius = int(max(len(input_asr) * radius_perc, radius_abs))
    grover_output = list(grover_output)[:len(input_asr) + max_radius]

    def prep(x: str) -> str:
        return x.translate(_PUNCT_TABLE).strip().lower()

    asr_pre = [prep(x) for x in input_asr]
    gro_pre = [prep(x) for x in grover_output]
    cost = np.full((len(asr_pre), len(gro_pre)), 9999.0, np.float32)
    for i, a in enumerate(asr_pre):
        for j in range(max(i - max_radius, 0), min(i + max_radius, len(gro_pre))):
            cost[i, j] = edit_distance(a, gro_pre[j])

    out: List[List[str]] = [[] for _ in input_asr]
    seen = -1
    for i, j in dtw_path(cost):
        if i >= len(input_asr) or j >= len(grover_output):
            break
        if j > seen:  # don't duplicate a denoised word matched to 2 ASR words
            out[i].append(grover_output[j])
        seen = j
    return [" ".join(x) for x in out]


# ----------------------------------------------------------------------
# text cleanup
# ----------------------------------------------------------------------
def fix_text(text: str) -> str:
    try:
        import ftfy
        return ftfy.ftfy(text)
    except ImportError:
        return text


def clean_subtitles(subtitle_dicts: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Drop &...; artifacts and empty words; repair mojibake
    (reference: :95-110)."""
    out = []
    for x in subtitle_dicts:
        if x["word"].startswith("&") or x["word"].endswith(";"):
            continue
        fixed = fix_text(x["word"])
        if not fixed:
            continue
        out.append({**x, "word": fixed})
    return out


def clean_description(text: str) -> str:
    """Emoji -> [name], URLs -> '%', whitespace normalization
    (reference: :112-126)."""
    try:
        import demoji
        for k, v in demoji.findall(text).items():
            text = text.replace(k, f"[{v}]".replace(" ", ""))
    except ImportError:
        pass
    text = text.strip()
    text = _URL_RE.sub("%", text)
    text = re.sub(" +", " ", text)
    text = re.sub(r"\s*\n+", "\n", text)
    return text.strip()


# ----------------------------------------------------------------------
# chunking
# ----------------------------------------------------------------------
def split_video_into_chunks(item: Dict[str, Any],
                            tokenizer=None) -> List[Dict[str, Any]]:
    """Greedy <=31-token chunking of the aligned transcript
    (reference: :129-195). ``item`` needs 'subtitles' ([{'word','time'}]),
    'denoised' ([{'cleanasr': ...}]) and 'info' ({'title', 'duration'?})."""
    tokenizer = tokenizer or get_tokenizer()
    subs = clean_subtitles(item["subtitles"])
    if not subs:
        raise ValueError("no usable subtitles")
    if "title" not in item["info"]:
        raise ValueError("'title' not in item['info']")

    words = [x["word"] for x in subs]
    times = [x["time"] for x in subs]
    encoded = [tokenizer.encode(" " + w.strip()) for w in words]

    denoised_words: List[str] = []
    for x in item["denoised"]:
        denoised_words += fix_text(x["cleanasr"]).split(" ")
    denoised = align_using_dtw(words, denoised_words)
    denoised_enc = [tokenizer.encode(f" {x}") if x else [] for x in denoised]

    max_ts = item["info"].get("duration", 1000000) - 1.0
    chunks: List[Dict[str, Any]] = []
    start_idx = 0
    clean_buf: List[int] = []
    noisy_buf: List[int] = []
    n = len(words)
    for idx in range(n):
        clean_buf += denoised_enc[idx]
        noisy_buf += encoded[idx]
        if idx < n - 1:
            noisy_after = len(noisy_buf) + len(encoded[idx + 1])
            clean_after = len(clean_buf) + len(denoised_enc[idx + 1])
            commit = max(noisy_after, clean_after) > CHUNK_LEN
            commit = commit or (denoised[idx].endswith((".", "?", "!"))
                                and len(clean_buf) >= CHUNK_LEN * STOP_THRESH)
        else:
            commit = True
        if commit:
            mean_ts = (times[start_idx] + times[idx]) / 2.0
            if mean_ts < max_ts:
                chunks.append({"start": start_idx, "end": idx,
                               "clean_enc": clean_buf, "noisy_enc": noisy_buf,
                               "is_eoc": False, "mean_timestep": mean_ts})
            clean_buf, noisy_buf = [], []
            start_idx = idx + 1
    if not chunks:
        raise ValueError("chunks is empty")
    chunks[-1]["is_eoc"] = True
    return chunks


# ----------------------------------------------------------------------
# tfrecord writing
# ----------------------------------------------------------------------
class ShufflingTFRecordWriter:
    """Shuffle-buffered writer (the reference's GCSTFRecordWriter,
    utils/data_utils.py:10-72, minus the GCS upload — pass a local path or
    mount GCS via fuse/fsspec).

    DELIBERATE REFERENCE QUIRK, opt-in: the reference's full-buffer branch
    (utils/data_utils.py:41-46) pops 20% of the buffer but never appends the
    incoming record — silently DROPPING ~1 record per flush cycle (~5% of
    the corpus at buffer_size=100). ``faithful_drop=True`` reproduces that
    for byte-level pipeline comparisons; the default keeps every record."""

    def __init__(self, path: str, buffer_size: int = 1,
                 faithful_drop: bool = False):
        self._w = TFRecordWriter(path)
        self.buffer_size = buffer_size
        self.faithful_drop = faithful_drop
        self.buffer: List[bytes] = []

    def write(self, payload: bytes) -> None:
        if self.buffer_size < 10:
            self._w.write(payload)
            return
        if len(self.buffer) < self.buffer_size:
            self.buffer.append(payload)
        else:
            random.shuffle(self.buffer)
            for _ in range(self.buffer_size // 5):  # pop 20%
                self._w.write(self.buffer.pop())
            if not self.faithful_drop:
                self.buffer.append(payload)  # the reference loses this one

    def close(self) -> None:
        if self.buffer_size > 1:
            random.shuffle(self.buffer)
        for x in self.buffer:
            self._w.write(x)
        self._w.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def chunk_features(chunk: Dict[str, Any], jpeg: bytes, width: int, height: int,
                   video_id: str, chunk_num: int) -> Dict[str, Any]:
    return {
        "image/encoded": jpeg,
        "image/height": [height],
        "image/width": [width],
        "image/key/sha256": hashlib.sha256(jpeg).hexdigest().encode(),
        "image/format": b"jpeg",
        "youtube_id": video_id.encode(),
        "tokenized_cleaned_asr": list(chunk["clean_enc"]),
        "tokenized_raw_asr": list(chunk["noisy_enc"]),
        "is_eoc": [int(chunk["is_eoc"])],
        "mean_time": [float(chunk["mean_timestep"])],
        "chunk_num": [chunk_num],
    }


def video_chunk_iterator(video_item: Dict[str, Any], video_file: str,
                         tokenizer=None) -> Iterator[List[Dict[str, Any]]]:
    """One video -> chunks with frames attached (reference: :199-222)."""
    from PIL import Image
    from merlot_tpu.data.video import (extract_frames_from_video,
                                       get_size_for_resize)
    chunks = split_video_into_chunks(video_item, tokenizer)
    frames = extract_frames_from_video(
        video_file, [c["mean_timestep"] for c in chunks])
    if frames is None:
        return
    trg = get_size_for_resize((frames.shape[2], frames.shape[1]),
                              shorter_size_trg=384, longer_size_max=512)
    for i, frame in enumerate(frames):
        img = Image.fromarray(frame, mode="RGB")
        if trg != img.size:
            img = img.resize(trg, resample=Image.BICUBIC)
        chunks[i]["chunk_num"] = i
        chunks[i]["frame"] = img
        chunks[i]["video_id"] = video_item["info"]["id"]
    yield chunks


def write_pretrain_shard(videos: Iterator, out_path: str,
                         num_chunks: int = NUM_CHUNKS,
                         shuffle_buffer: int = 100) -> int:
    """Group chunks from many videos into num_chunks-sized examples and
    write them shuffled (reference: :224-263). ``videos`` yields
    (video_item, video_file) pairs."""
    tokenizer = get_tokenizer()
    buffer: List[Dict[str, Any]] = []
    n_written = 0
    with ShufflingTFRecordWriter(out_path, buffer_size=shuffle_buffer) as w:
        def flush():
            nonlocal n_written, buffer
            while len(buffer) >= num_chunks:
                group, buffer = buffer[:num_chunks], buffer[num_chunks:]
                feats = {}
                for i, c in enumerate(group):
                    buf = io.BytesIO()
                    c["frame"].save(buf, format="JPEG", quality=95)
                    for k, v in chunk_features(
                            c, buf.getvalue(), c["frame"].width,
                            c["frame"].height, c["video_id"], c["chunk_num"]
                    ).items():
                        feats[f"c{i:02d}/{k}"] = v
                w.write(encode_example(feats))
                n_written += 1

        for video_item, video_file in videos:
            for chunks in video_chunk_iterator(video_item, video_file, tokenizer):
                buffer.extend(chunks)
                flush()
    return n_written


def main(argv=None):
    """CLI: (video.mp4, video.grover.json) pairs -> a pretrain shard.

    The data/process.py example-driver analogue: each json carries
    'subtitles' ([{word, time}]), 'denoised' ([{cleanasr}]) and 'info'
    ({id, title, duration}) as produced by the Grover denoiser service.
    """
    import argparse
    import json
    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--videos", nargs="+", required=True,
                    help="video files; '<stem>.grover.json' must sit beside each")
    ap.add_argument("--out", default="out.tfrecord")
    ap.add_argument("--num_chunks", type=int, default=NUM_CHUNKS)
    ap.add_argument("--shuffle_buffer", type=int, default=100)
    args = ap.parse_args(argv)

    def videos():
        for vf in args.videos:
            info_fn = vf.rsplit(".", 1)[0] + ".grover.json"
            with open(info_fn) as f:
                yield json.load(f), vf

    n = write_pretrain_shard(videos(), args.out, num_chunks=args.num_chunks,
                             shuffle_buffer=args.shuffle_buffer)
    print(f"wrote {n} examples to {args.out}")


if __name__ == "__main__":
    main()
