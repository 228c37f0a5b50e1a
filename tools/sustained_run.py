"""Sustained-run integration proof: long pretrain + preemption + exact resume.

The reference's regime is long-lived TPUEstimator runs with periodic
checkpoints (model/configs/merlot.yaml:66,72: save every 20k steps of a
460k-step run) that restart from the latest checkpoint after any crash
(TPUEstimator relaunch semantics). Everything else in this repo is
step-level; this tool is the missing integration proof (VERDICT r3 #4):
the full stack — real loader, overlapped infeed, jitted train step,
periodic checkpoints, metrics — holding together for tens of minutes on
the real chip, dying like a preempted worker, and resuming bit-exactly.

Modes (run on the chip host):

  python tools/sustained_run.py run --out /tmp/sustained --minutes 30 [--crash]
      Flagship-config pretrain (B8, 16 chunks) with the REAL
      PretrainLoader overlapped (synthetic shards; JPEG decode,
      align-corners resize, augment, chunk/frame shuffle — the round-1
      e2e pipeline). Checkpoints every --ckpt_every steps via the
      production Trainer; per-window seg/s lands in metrics.jsonl, and a
      sidecar sustained.jsonl records wall time + device memory per
      window. With --crash, once the wall-clock budget expires the
      process dies at a drained step boundary a few steps PAST the last
      checkpoint (os._exit(1), no graceful save) — a preemption: work
      since the boundary is lost. Relaunching the same command resumes
      from the latest checkpoint (Trainer.init_state restore-from-latest).

  python tools/sustained_run.py exact --out /tmp/sustained_exact [--k 20]
      Bit-exact-resume proof at the full flagship shape: leg A trains
      2K steps from scratch (checkpoints at K and 2K); leg B copies only
      the step-K checkpoint into a fresh directory, resumes from it, and
      trains to 2K. Every leaf of the two step-2K checkpoints (params AND
      Adam state) must be bitwise identical — the per-step RNG folds from
      (root_key, opt_state.step), so the trajectories coincide exactly.

  --tiny runs either mode at the toy config for a CPU smoke test.
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CHUNKS = 16


def _build(tiny: bool):
    from __graft_entry__ import _flagship_config
    from merlot_tpu.models.pretrain import MerlotPretrainModel
    from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW

    cfg = _flagship_config(tiny=tiny)
    model = MerlotPretrainModel(cfg)
    optimizer = MerlotAdamW(AdamWConfig(
        learning_rate=3e-4, num_train_steps=460000, num_warmup_steps=10000,
        weight_decay_rate=0.1, beta_2=0.98, clip_norm=0.0,
        use_bfloat16_adam=True,
        param_overrides=((("attn_ln", "mlp_ln", "final_ln", "embed_norm",
                           "/gn", "bias", "beta", "gamma"),
                          {"weight_decay_rate": 0.0}),)))
    return cfg, model, optimizer


def _memory_stats():
    import jax
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in stats.items()
                if "bytes" in k and isinstance(v, (int, float))}
    except Exception:
        return {}


# ---------------------------------------------------------------------------
def run_mode(args) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import _make_batch
    from merlot_tpu.data.pretrain_loader import (PretrainLoader,
                                                 device_put_iterator)
    from merlot_tpu.train.harness import Trainer
    from tools.bench_e2e import ensure_shards

    cfg, model, optimizer = _build(args.tiny)
    h, w = cfg.image_size

    trainer = Trainer(model, optimizer, args.out, log_every=args.log_every,
                      checkpoint_every=args.ckpt_every, seed=0)
    example = _make_batch(cfg, batch=args.batch, num_chunks=NUM_CHUNKS)
    params, opt_state = trainer.init_state(example)
    start_step = int(jax.device_get(opt_state["step"]))
    print(f"starting at step {start_step} "
          f"({'resumed' if start_step else 'fresh'})", flush=True)

    if args.tiny:
        # CPU smoke: skip the JPEG pipeline, repeat a host batch
        host_batches = itertools.repeat(
            {k: np.asarray(v) for k, v in example.items()})
    else:
        files = ensure_shards()
        loader_cfg = {
            "num_chunks": NUM_CHUNKS, "image_size": [h, w],
            "chunk_text_len": 32, "num_chunks_in_group": cfg.num_chunks_in_group,
            "image_shuffle_prob": 0.4, "shuffle_chunks": True,
            "augment_prob": 0.6,
        }
        # seed by resume step so a resumed run sees a fresh shuffle order
        # (the reference's time-seeded file shuffle, model/dataloader.py:157)
        host_batches = iter(PretrainLoader(
            files, loader_cfg, batch_size=args.batch, num_threads=8,
            shuffle_buffer=32, seed=start_step, repeat=True))
    batches = device_put_iterator(host_batches)

    deadline = time.time() + args.minutes * 60
    sidecar_path = os.path.join(args.out, "sustained.jsonl")
    sidecar = open(sidecar_path, "a")
    t0 = time.time()

    def instrumented():
        """Yield device batches; crash/stop only at DRAINED boundaries.

        Code after ``yield`` runs when the Trainer asks for the next
        batch, i.e. after it fully processed step ``step`` — including
        the device_get sync on log boundaries — so an os._exit here
        never kills an in-flight device program (the tunnel-wedge
        failure mode, CLAUDE.md)."""
        step = start_step
        last_window = [step, time.time()]
        for b in batches:
            yield b
            step += 1
            if step % args.log_every == 0:
                now = time.time()
                dt = now - last_window[1]
                segs = (step - last_window[0]) * args.batch * NUM_CHUNKS
                rec = {"t": round(now - t0, 1), "step": step,
                       "seg_per_s": round(segs / dt, 2)}
                rec.update(_memory_stats())
                sidecar.write(json.dumps(rec) + "\n")
                sidecar.flush()
                last_window = [step, now]
                if time.time() > deadline:
                    past = step % args.ckpt_every
                    if past == 0 or step < args.ckpt_every:
                        continue  # reach/pass a ckpt boundary first
                    if args.crash:
                        rec = {"t": round(time.time() - t0, 1), "step": step,
                               "event": "simulated_preemption",
                               "lost_steps_since_ckpt": past}
                        sidecar.write(json.dumps(rec) + "\n")
                        sidecar.flush()
                        os.fsync(sidecar.fileno())
                        print(f"simulated preemption at step {step} "
                              f"({past} steps past the last checkpoint)",
                              flush=True)
                        os._exit(1)
                    return

    trainer.run(params, opt_state, instrumented(), num_steps=10 ** 9)
    print(f"sidecar: {sidecar_path}", flush=True)


# ---------------------------------------------------------------------------
def _exact_leg(out_dir: str, total_steps: int, k: int, tiny: bool,
               batch: int) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from __graft_entry__ import _make_batch
    from merlot_tpu.train.harness import Trainer

    cfg, model, optimizer = _build(tiny)
    trainer = Trainer(model, optimizer, out_dir, log_every=k,
                      checkpoint_every=k, seed=0)
    example = _make_batch(cfg, batch=batch, num_chunks=NUM_CHUNKS)
    params, opt_state = trainer.init_state(example)
    start = int(jax.device_get(opt_state["step"]))
    print(f"[leg {out_dir}] start step {start} -> {total_steps}", flush=True)
    # one resident batch: exactness is about state evolution (per-step RNG
    # folds from opt_state.step), not data variety
    trainer.run(params, opt_state,
                itertools.repeat(example, total_steps - start), total_steps)


def exact_mode(args) -> None:
    k, total = args.k, 2 * args.k
    dir_a = os.path.join(args.out, "legA")
    dir_b = os.path.join(args.out, "legB")
    for d in (dir_a, dir_b):
        if os.path.exists(d):
            shutil.rmtree(d)

    _exact_leg(dir_a, total, k, args.tiny, args.batch)

    # leg B sees ONLY the step-k checkpoint
    os.makedirs(os.path.join(dir_b, "checkpoints"), exist_ok=True)
    shutil.copytree(os.path.join(dir_a, "checkpoints", f"ckpt_{k}"),
                    os.path.join(dir_b, "checkpoints", f"ckpt_{k}"))
    _exact_leg(dir_b, total, k, args.tiny, args.batch)

    from merlot_tpu.train.checkpoint import CheckpointManager
    a = CheckpointManager(os.path.join(dir_a, "checkpoints")).restore(total)
    b = CheckpointManager(os.path.join(dir_b, "checkpoints")).restore(total)
    import jax
    flat_a = {"/".join(str(getattr(p, "key", p)) for p in kp): leaf
              for kp, leaf in jax.tree_util.tree_flatten_with_path(a)[0]}
    flat_b = {"/".join(str(getattr(p, "key", p)) for p in kp): leaf
              for kp, leaf in jax.tree_util.tree_flatten_with_path(b)[0]}
    assert flat_a.keys() == flat_b.keys(), "checkpoint trees differ"
    mismatched = [p for p in flat_a
                  if np.asarray(flat_a[p]).tobytes()
                  != np.asarray(flat_b[p]).tobytes()]
    n = len(flat_a)
    if mismatched:
        print(f"BIT-EXACT RESUME: FAILED — {len(mismatched)}/{n} leaves "
              f"differ, e.g. {mismatched[:5]}", flush=True)
        sys.exit(1)
    print(f"BIT-EXACT RESUME: OK — all {n} leaves of the step-{total} "
          f"checkpoints (params + Adam state) are bitwise identical "
          f"between the continuous run and the resumed-from-step-{k} run",
          flush=True)


# ---------------------------------------------------------------------------
def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    run = sub.add_parser("run")
    run.add_argument("--out", required=True)
    run.add_argument("--minutes", type=float, default=30.0)
    run.add_argument("--batch", type=int, default=8)
    run.add_argument("--ckpt_every", type=int, default=150)
    run.add_argument("--log_every", type=int, default=25)
    run.add_argument("--crash", action="store_true",
                     help="die abruptly past the last checkpoint when the "
                          "budget expires (simulated preemption)")
    run.add_argument("--tiny", action="store_true")
    exact = sub.add_parser("exact")
    exact.add_argument("--out", required=True)
    exact.add_argument("--k", type=int, default=20)
    exact.add_argument("--batch", type=int, default=8)
    exact.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.mode == "run":
        run_mode(args)
    else:
        exact_mode(args)


if __name__ == "__main__":
    main()
