"""End-to-end pretrain throughput: host loader + device train step OVERLAPPED.

VERDICT r1 item 4: bench.py feeds a synthetic resident batch; this tool
drives the REAL pipeline — tfrecord shards -> PretrainLoader (JPEG decode,
random-scale align-corners resize, augment, chunk/frame shuffle) ->
device_put_iterator double-buffering -> jitted train step — and reports
three numbers:

  loader-only seg/s   (host pipeline alone, this host's cores)
  device-only seg/s   (train step on a resident batch; bench.py's metric)
  overlapped  seg/s   (the real loop; should approach min(loader, device))

The reference's equivalent is the TPUEstimator PER_HOST_V2 infeed
(utils/neat_config.py:145 + model/dataloader.py:277). Real TPU hosts have
>10 cores/chip; this box has ONE, so the overlapped number here is
loader-bound — the point is to demonstrate the overlap (total ~= max of
the stages, not the sum) and record per-core loader throughput.

Run on the chip host:  python tools/bench_e2e.py [B] [num_steps]
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARD_DIR = "/tmp/e2e_shards_real"
IMG_HW = (192, 352)
NUM_CHUNKS = 16


def ensure_shards(num_shards: int = 2, examples_per_shard: int = 16) -> list:
    from merlot_tpu.data.make_synthetic_tfrecord import write_synthetic_shard
    os.makedirs(SHARD_DIR, exist_ok=True)
    files = sorted(glob.glob(os.path.join(SHARD_DIR, "*.tfrecord")))
    if len(files) == num_shards:
        return files
    for i in range(num_shards):
        path = os.path.join(SHARD_DIR, f"train-{i:05d}.tfrecord")
        print(f"writing {path} ...", flush=True)
        write_synthetic_shard(path, num_examples=examples_per_shard,
                              num_chunks=NUM_CHUNKS, img_hw=IMG_HW, seed=i)
    return sorted(glob.glob(os.path.join(SHARD_DIR, "*.tfrecord")))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import _flagship_config, _make_batch
    from merlot_tpu.data.pretrain_loader import (PretrainLoader,
                                                 device_put_iterator)
    from merlot_tpu.models.pretrain import MerlotPretrainModel
    from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW
    from merlot_tpu.train.train_step import init_train_state, make_train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    files = ensure_shards()

    cfg = _flagship_config()
    loader_cfg = {
        "num_chunks": NUM_CHUNKS, "image_size": list(IMG_HW),
        "chunk_text_len": 32, "num_chunks_in_group": 4,
        "image_shuffle_prob": 0.4, "shuffle_chunks": True,
        "augment_prob": 0.6,
    }

    # ---- loader alone -------------------------------------------------
    loader = PretrainLoader(files, loader_cfg, batch_size=B,
                            num_threads=8, shuffle_buffer=32, seed=0,
                            repeat=True)
    it = iter(loader)
    next(it)  # warm the pipeline
    t0 = time.time()
    n_loader_batches = 6
    for _ in range(n_loader_batches):
        next(it)
    dt_loader = (time.time() - t0) / n_loader_batches
    loader_sps = B * NUM_CHUNKS / dt_loader
    print(f"loader-only : {loader_sps:8.1f} seg/s "
          f"({os.cpu_count()} host cores)", flush=True)

    # ---- device alone -------------------------------------------------
    model = MerlotPretrainModel(cfg)
    optimizer = MerlotAdamW(AdamWConfig(
        learning_rate=3e-4, num_train_steps=460000, num_warmup_steps=10000,
        weight_decay_rate=0.1, beta_2=0.98, use_bfloat16_adam=True))
    resident = _make_batch(cfg, batch=B, num_chunks=NUM_CHUNKS)
    params, opt_state = init_train_state(model, optimizer, resident)
    step_fn = make_train_step(model, optimizer)
    key = jax.random.PRNGKey(0)
    params, opt_state, metrics = step_fn(params, opt_state, resident, key)
    float(np.asarray(jax.device_get(metrics["loss"])))  # sync
    t0 = time.time()
    for _ in range(8):
        params, opt_state, metrics = step_fn(params, opt_state, resident, key)
    float(np.asarray(jax.device_get(metrics["loss"])))
    dt_dev = (time.time() - t0) / 8
    device_sps = B * NUM_CHUNKS / dt_dev
    print(f"device-only : {device_sps:8.1f} seg/s", flush=True)

    # ---- overlapped ----------------------------------------------------
    # E2E_INFEED=u8 quantizes images to uint8 for the transfer (1 B/px,
    # half of bf16; device dequantizes) — the lever when the host->device
    # link is the bottleneck, as on this box's 10-25 MB/s tunnel
    infeed = os.environ.get("E2E_INFEED", "bf16")
    batches = device_put_iterator(iter(loader), images_u8=(infeed == "u8"))
    b0 = next(batches)
    params, opt_state, metrics = step_fn(params, opt_state, b0, key)
    float(np.asarray(jax.device_get(metrics["loss"])))
    t0 = time.time()
    done = 0
    for batch in batches:
        params, opt_state, metrics = step_fn(params, opt_state, batch, key)
        done += 1
        if done >= n_steps:
            break
    float(np.asarray(jax.device_get(metrics["loss"])))
    dt = (time.time() - t0) / done
    overlapped_sps = B * NUM_CHUNKS / dt
    print(f"overlapped  : {overlapped_sps:8.1f} seg/s  "
          f"(bound by {'loader' if loader_sps < device_sps else 'device'}; "
          f"ideal overlap = {min(loader_sps, device_sps):.1f})", flush=True)


if __name__ == "__main__":
    main()
