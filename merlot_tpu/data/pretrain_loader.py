"""Async host data pipeline for pretraining.

Replaces the reference's tf.data input_fn (model/dataloader.py:129-280) with
a thread-pooled numpy pipeline feeding device-resident batches:

  files -> per-host shard -> round-robin interleave -> shuffle buffer
        -> parse (JPEG decode, random-scale align-corners resize+pad,
           brightness/contrast augment, NaN scrub, clean-vs-raw ASR choice,
           START/NEXTCAPTION_START prefix, pad to [num_chunks, 32])
        -> batch -> chunk-shuffle + frame-shuffle sampling -> prefetch queue

Behavioural parity notes (all from model/dataloader.py):
  * clean vs raw ASR is chosen **per example** w.p. ``clean_asr_prob``, with
    distinct start tokens START / NEXTCAPTION_START (:101-118);
  * ``is_eoc`` of the last chunk is forced to 1 and ``video_src_ids`` is the
    cumulative sum of end-of-clip deltas (:123-125);
  * chunk-shuffle re-randomizes *video block* order within an example
    (:211-222); frame-shuffle draws how many segments per group to shuffle
    from [1-p, ~0, p/(g-1)...] then offsets shuffled PE indices by
    ``shuffle_offset`` (:225-257). The reference uses offset 16 at pretrain
    (and 64 at zero-shot); note that 16 < 64 means shuffled frames still
    count "easy" in the temporal loss — we reproduce that quirk and expose
    ``shuffle_offset`` to change it;
  * images are NOT transposed — the reference's [H,W,3,B] ``transpose_input``
    (:259-264) is a TF1-TPU layout hack XLA does not need.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from merlot_tpu.core.tokenizer import NEXTCAPTION_START, START
from merlot_tpu.data import image_ops
from merlot_tpu.data.tfrecord import parse_example, read_tfrecords

CHUNK_KEYS = ("image/encoded", "tokenized_cleaned_asr", "tokenized_raw_asr",
              "is_eoc", "mean_time", "chunk_num", "youtube_id")


def shard_files(files: Sequence[str], host_id: int = 0, num_hosts: int = 1,
                shuffle: bool = False, seed: Optional[int] = None) -> List[str]:
    """Per-host file sharding (reference: model/dataloader.py:146-167)."""
    files = list(files)
    if num_hosts > 1:
        assert len(files) // num_hosts >= 1
        files = files[host_id::num_hosts]
    elif shuffle:
        np.random.default_rng(seed).shuffle(files)
    return files


def shuffle_records(stream: Iterator[bytes], buffer_size: int,
                    rng: np.random.Generator) -> Iterator[bytes]:
    """Record-level reservoir shuffle buffer (tf.data ``dataset.shuffle``
    semantics, reference: model/dataloader.py:180-184 and
    downstream/vcr/dataloader_joint.py:249-251): hold ``buffer_size``
    records, emit a uniformly chosen one as each new record arrives, flush
    shuffled at end-of-stream. ``buffer_size`` <= 0 passes through."""
    if buffer_size <= 0:
        yield from stream
        return
    buf: List[bytes] = []
    for rec in stream:
        buf.append(rec)
        if len(buf) >= buffer_size:
            j = rng.integers(0, len(buf))
            buf[j], buf[-1] = buf[-1], buf[j]
            yield buf.pop()
    rng.shuffle(buf)
    yield from buf


def parse_pretrain_example(payload: bytes, config: Dict[str, Any],
                           rng: np.random.Generator,
                           is_training: bool = True) -> Dict[str, np.ndarray]:
    """One serialized Example -> features dict (reference: :56-126)."""
    num_chunks = config["num_chunks"]
    image_size = config["image_size"]
    len_per_chunk = config.get("chunk_text_len", 32)

    ex = parse_example(payload)

    imgs = np.zeros((num_chunks, image_size[0], image_size[1], 3), np.float32)
    tokens = np.zeros((num_chunks, len_per_chunk), np.int32)
    is_eoc = np.zeros(num_chunks, bool)
    mean_time = np.zeros(num_chunks, np.float32)
    chunk_num = np.zeros(num_chunks, np.int32)

    do_clean = rng.uniform() < config.get("clean_asr_prob", 0.5)
    start_token = START if do_clean else NEXTCAPTION_START
    asr_key = "tokenized_cleaned_asr" if do_clean else "tokenized_raw_asr"

    for i in range(num_chunks):
        pre = f"c{i:02d}/"
        img = image_ops.decode_jpeg_u8(ex[pre + "image/encoded"][0])
        if is_training:
            img, _ = image_ops.resize_and_pad(
                img, image_size, rng=rng, do_random_scale=True,
                random_scale_max=config.get("random_scale_max", 1.05),
                random_scale_min=config.get("random_scale_min", 0.95),
                resize_method="random")
        else:
            img, _ = image_ops.resize_and_pad(img, image_size)
        img = np.where(np.isfinite(img), img, 0.0).astype(np.float32)
        if is_training and config.get("augment_prob", 0.0) > 0.0:
            img = image_ops.lightweight_image_augment(
                img, rng, augment_prob=config["augment_prob"],
                allowed_transforms="brightness,contrast")
        imgs[i] = img

        toks = np.asarray(ex[pre + asr_key], np.int32)[:len_per_chunk - 1]
        tokens[i, 0] = start_token
        tokens[i, 1:1 + len(toks)] = toks

        is_eoc[i] = bool(ex[pre + "is_eoc"][0]) if i < num_chunks - 1 else True
        mean_time[i] = float(ex[pre + "mean_time"][0])
        chunk_num[i] = int(ex[pre + "chunk_num"][0])

    # youtube id as a fixed-size uint8 array (encode_string analogue,
    # reference: utils/model_utils.py:628-637 + dataloader.py:66)
    yid = ex["c00/youtube_id"][0][:64] if "c00/youtube_id" in ex else b""
    youtube_id = np.zeros(64, np.uint8)
    youtube_id[:len(yid)] = np.frombuffer(yid, np.uint8)

    delta = np.concatenate([[0], is_eoc[:-1].astype(np.int32)])
    out = {
        "images": imgs,
        "input_ids": tokens,
        "is_eoc": is_eoc,
        "video_src_ids": np.cumsum(delta).astype(np.int32),
        "mean_time": mean_time,
        "chunk_num": chunk_num,
        "youtube_id": np.broadcast_to(youtube_id, (num_chunks, 64)).copy(),
    }
    # unbatch path for huge per-example chunk counts (reference:
    # model/dataloader.py:190-207): split one num_chunks example into
    # unbatch_size sub-examples of num_chunks/unbatch_size chunks each
    unbatch = config.get("unbatch_size", 1)
    if unbatch > 1:
        assert num_chunks % unbatch == 0
        sub = num_chunks // unbatch
        return [
            {k: v[i * sub:(i + 1) * sub] for k, v in out.items()}
            for i in range(unbatch)
        ]
    return out


# ----------------------------------------------------------------------
# batch-level transforms (reference: model/dataloader.py:210-276)
# ----------------------------------------------------------------------
def shuffle_chunks(batch: Dict[str, np.ndarray],
                   rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Re-randomize the order of video blocks inside each example."""
    vsrc = batch["video_src_ids"]
    bsz, nchunk = vsrc.shape
    mapping = np.argsort(rng.uniform(size=(bsz, nchunk)), axis=-1)
    new_chunkid = np.take_along_axis(mapping, vsrc, axis=1)
    trg_idx = new_chunkid * nchunk + np.arange(nchunk, dtype=np.int32)[None]
    idx = np.argsort(trg_idx, axis=1)
    out = dict(batch)
    # fancy row indexing, NOT np.take_along_axis: take_along_axis broadcasts
    # the index to the operand's FULL shape (for [B,16,192,352,3] images
    # that is a 26M-element int64 index + scalar gather — profiled at
    # ~1.1 s/batch, the whole loader's budget); advanced indexing gathers
    # whole chunk rows via memcpy. Semantics identical.
    rows = np.arange(bsz)[:, None]
    for k in ("images", "input_ids", "is_eoc", "video_src_ids", "mean_time",
              "chunk_num", "youtube_id"):
        if k in out:
            out[k] = out[k][rows, idx]
    return out


def sample_shuffled_idx(batch_size: int, num_chunks: int, group: int,
                        shuffle_prob: float, shuffle_offset: int,
                        rng: np.random.Generator) -> np.ndarray:
    """Frame-shuffle PE indices, flat [batch*num_chunks]
    (reference: :225-257)."""
    B = batch_size * num_chunks // group
    if shuffle_prob < 1e-6:
        return np.tile(np.arange(group, dtype=np.int32), B)

    probs = np.array([1.0 - shuffle_prob, 1e-6]
                     + [shuffle_prob / (group - 1)] * (group - 1))
    probs = probs / probs.sum()
    num_shuffle = rng.choice(len(probs), size=B, p=probs).astype(np.int32)
    do_shuffle = np.argsort(rng.uniform(size=(B, group)), 1) < num_shuffle[:, None]
    shuffled = np.where(
        do_shuffle,
        shuffle_offset + np.argsort(rng.uniform(size=(B, group)), 1),
        np.tile(np.arange(group, dtype=np.int64)[None], (B, 1)))
    return shuffled.reshape(-1).astype(np.int32)


def collate_pretrain_batch(examples: List[Dict[str, np.ndarray]],
                           config: Dict[str, Any],
                           rng: np.random.Generator,
                           is_training: bool = True) -> Dict[str, np.ndarray]:
    batch = {k: np.stack([e[k] for e in examples]) for k in examples[0]}
    if is_training and config.get("shuffle_chunks", False):
        batch = shuffle_chunks(batch, rng)

    bsz, nchunk = batch["input_ids"].shape[:2]
    group = config["num_chunks_in_group"]
    batch["shuffled_idx_img"] = sample_shuffled_idx(
        bsz, nchunk, group,
        shuffle_prob=config.get("image_shuffle_prob", 0.5),
        shuffle_offset=config.get("shuffle_offset", 16),
        rng=rng)

    # flatten frames: [bsz, nchunk, h, w, 3] -> [bsz*nchunk, h, w, 3]
    b, n, h, w, c = batch["images"].shape
    batch["images"] = batch["images"].reshape(b * n, h, w, c)
    return batch


# ----------------------------------------------------------------------
# the async loader
# ----------------------------------------------------------------------
class _ProducerError:
    """Exception carrier across the producer queue (re-raised in the
    consumer so loader errors cannot masquerade as end-of-stream)."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class PretrainLoader:
    """Threaded tfrecord -> batch pipeline with a bounded prefetch queue.

    Iterate to get numpy batches; wrap with ``device_put_iterator`` for
    double-buffered host->device transfer.
    """

    def __init__(self, files: Sequence[str], config: Dict[str, Any],
                 batch_size: int, is_training: bool = True,
                 host_id: int = 0, num_hosts: int = 1,
                 num_threads: int = 8, shuffle_buffer: int = 256,
                 prefetch: int = 2, seed: int = 0,
                 repeat: Optional[bool] = None,
                 cycle_length: int = 16):
        self.files = shard_files(files, host_id, num_hosts,
                                 shuffle=is_training, seed=seed)
        if not self.files:
            raise ValueError("no input files")
        self.config = config
        self.batch_size = batch_size
        self.is_training = is_training
        # never oversubscribe the host: the parse work is numpy-CPU-bound,
        # and more pool threads than cores THRASHES (measured on a 1-core
        # host: 181 seg/s at 1 thread vs 12.7 at 4 — GIL + cache churn);
        # on real TPU hosts (>10 cores) the requested count stands.
        # sched_getaffinity = cores actually ALLOTTED to this process
        # (cgroup/container limits), not the machine total
        import os as _os
        try:
            avail = len(_os.sched_getaffinity(0))
        except AttributeError:  # non-Linux
            avail = _os.cpu_count() or num_threads
        self.num_threads = max(1, min(num_threads, avail))
        self.shuffle_buffer = shuffle_buffer if is_training else 0
        self.prefetch = prefetch
        self.seed = seed
        self.repeat = is_training if repeat is None else repeat
        self.cycle_length = cycle_length

    def _record_stream(self) -> Iterator[bytes]:
        """Interleave over at most ``cycle_length`` files at a time, pulling
        the next file as one exhausts — bounded open handles at
        thousands-of-shards scale, like the reference's parallel_interleave
        (model/dataloader.py:174-178)."""
        while True:
            todo = list(self.files)
            active: List[Iterator[bytes]] = []
            while todo or active:
                while todo and len(active) < self.cycle_length:
                    active.append(read_tfrecords(todo.pop(0)))
                for it in list(active):
                    try:
                        yield next(it)
                    except StopIteration:
                        active.remove(it)
            if not self.repeat:
                return

    def _shuffled_records(self, rng) -> Iterator[bytes]:
        yield from shuffle_records(self._record_stream(),
                                   self.shuffle_buffer, rng)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def guarded_put(item) -> bool:
            """put() that never deadlocks a daemon thread: rechecks stop
            while the queue is full (the consumer may have abandoned us)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            pool = None
            try:
                pool = ThreadPoolExecutor(self.num_threads)
                pending: List = []
                ready: List[Dict[str, np.ndarray]] = []  # parsed (sub)examples
                records = self._shuffled_records(rng)
                # one child Generator per task: np.random.Generator is NOT
                # thread-safe, and more tasks than generators can be in
                # flight at once
                seed_seq = np.random.SeedSequence(self.seed + 1)
                for rec in records:
                    if stop.is_set():
                        break
                    (child,) = seed_seq.spawn(1)
                    pending.append(pool.submit(
                        parse_pretrain_example, rec, self.config,
                        np.random.default_rng(child), self.is_training))
                    if len(pending) >= self.batch_size:
                        for p in pending[:self.batch_size]:
                            r = p.result()
                            # unbatch_size>1 splits one source example into
                            # independent examples (reference unbatches then
                            # re-batches, model/dataloader.py:190-207) — the
                            # emitted batch size stays batch_size
                            ready.extend(r if isinstance(r, list) else [r])
                        pending = pending[self.batch_size:]
                        while len(ready) >= self.batch_size:
                            batch = collate_pretrain_batch(
                                ready[:self.batch_size], self.config, rng,
                                self.is_training)
                            ready = ready[self.batch_size:]
                            if not guarded_put(batch):
                                break
                # drain a final partial-free flush of whole batches
                while len(ready) >= self.batch_size and not stop.is_set():
                    batch = collate_pretrain_batch(
                        ready[:self.batch_size], self.config, rng,
                        self.is_training)
                    ready = ready[self.batch_size:]
                    guarded_put(batch)
                guarded_put(None)
            except BaseException as e:
                # re-raise in the consumer — a swallowed parse/collate
                # error would read as a clean end-of-stream and silently
                # truncate training
                guarded_put(_ProducerError(e))
            finally:
                # shut down on EVERY exit (success, error, stop): without
                # this, in-flight parse futures keep burning CPU after an
                # error is handed to a consumer that catches it
                if pool is not None:
                    pool.shutdown(wait=False, cancel_futures=True)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, _ProducerError):
                    raise batch.exc
                yield batch
        finally:
            stop.set()


def device_put_iterator(it, sharding=None, images_bf16: bool = True,
                        images_u8: bool = False, threaded: bool = True):
    """Double-buffered host->device transfer (the infeed-queue analogue).

    images_bf16 casts the float image tensor to bf16 on the host before the
    transfer — halves infeed bytes with NO compute-path change (the model's
    first conv casts to bf16 anyway; the reference's bf16 infeed does the
    same, model/dataloader.py:259-264 + use_bfloat16). Pass False for fp32
    models.

    images_u8 quantizes the float [0,1] images to uint8 instead — HALVES
    the bytes AGAIN vs bf16 (1 B/px); the backbone dequantizes on device
    (nn/vit.py). NOT bit-identical: resize/augment interpolation values are
    rounded to 1/255 steps (error <= 1/510/pixel, same order as the bf16
    rounding the default already applies). Off by default; the lever for
    hosts where the infeed link, not the loader, is the bottleneck.

    threaded runs the device_put on a dedicated thread (depth-1 queue;
    up to 3 device-resident batches at peak — consumer-held + queued +
    in-flight in the worker, one more than a plain prev/nxt double
    buffer): hides transfers that BLOCK, like the axon tunnel's
    synchronous upload. Worker errors re-raise in the consumer."""
    import jax
    import jax.numpy as jnp

    def prep(batch):
        if images_u8 and "images" in batch:
            batch = dict(batch)
            batch["images"] = np.clip(
                np.round(batch["images"] * 255.0), 0, 255).astype(np.uint8)
        elif images_bf16 and "images" in batch:
            batch = dict(batch)
            batch["images"] = batch["images"].astype(jnp.bfloat16)
        return batch

    def put(batch):
        return (jax.device_put(batch, sharding) if sharding is not None
                else jax.device_put(batch))

    if threaded:
        # run device_put on a dedicated thread so a transfer that BLOCKS
        # (e.g. the axon tunnel's synchronous upload) overlaps the device
        # step instead of serializing with it. maxsize=1: at most one batch
        # queued + one in flight in the worker + one held by the consumer —
        # up to THREE device-resident batches at peak, one more than a
        # plain prev/nxt double buffer; the extra buffer is what lets a
        # blocking transfer overlap the device step.
        q: "queue.Queue" = queue.Queue(maxsize=1)
        stop = threading.Event()

        def send(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in it:
                    if not send(("batch", put(prep(batch)))):
                        return
                send(("end", None))
            except BaseException as e:  # propagate into the consumer —
                send(("error", e))      # a swallowed loader/transfer error
                                        # would silently truncate training

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "error":
                    raise payload
                if kind == "end":
                    return
                yield payload
        finally:
            stop.set()

    prev = None
    for batch in it:
        batch = prep(batch)
        nxt = put(batch)
        if prev is not None:
            yield prev
        prev = nxt
    if prev is not None:
        yield prev
