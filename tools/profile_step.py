"""Per-op device-time profile of the flagship train step.

Runs the full pretrain training step under jax.profiler.trace on the real
chip, parses the chrome-trace JSON the profiler emits (no TensorFlow needed),
and prints device time aggregated per HLO op/fusion, sorted descending —
the data that drives kernel work (PERF.md "where the time actually goes").

Usage (on the chip):
    python tools/profile_step.py [batch] [n_steps]
Env: PROF_FWD_ONLY=1 profiles the forward only.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict


def parse_trace(trace_dir: str, min_pct: float = 0.5):
    """Aggregate device-track event durations by (cleaned) op name."""
    paths = (glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
             + glob.glob(os.path.join(trace_dir, "**", "*.trace.json"),
                         recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # identify device (TPU) process ids: metadata events name them
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r"TPU|/device|XLA Op", name, re.I)}

    per_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        # strip the auto-numbering so repeated layers aggregate
        key = re.sub(r"[.\d]+$", "", name)
        per_op[key] += e["dur"]
        total += e["dur"]

    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\ntrace: {path}")
    print(f"total device-event time: {total / 1e3:.1f} ms "
          f"(sums overlapping tracks; use ratios)")
    print(f"{'op':<72} {'ms':>9} {'%':>6}")
    for name, us in rows:
        pct = 100.0 * us / max(total, 1e-9)
        if pct < min_pct:
            break
        print(f"{name[:72]:<72} {us / 1e3:>9.2f} {pct:>6.2f}")
    return rows, total


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _flagship_config, _make_batch
    from merlot_tpu.models.pretrain import MerlotPretrainModel
    from merlot_tpu.train.optimizer import AdamWConfig, MerlotAdamW
    from merlot_tpu.train.train_step import init_train_state, make_train_step

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = _flagship_config()
    model = MerlotPretrainModel(cfg)
    optimizer = MerlotAdamW(AdamWConfig(
        learning_rate=3e-4, num_train_steps=460000, num_warmup_steps=10000,
        weight_decay_rate=0.1, beta_2=0.98, clip_norm=0.0,
        use_bfloat16_adam=True))
    batch = _make_batch(cfg, batch=batch_size, num_chunks=16)
    params, opt_state = init_train_state(model, optimizer, batch)
    step_fn = make_train_step(model, optimizer)
    key = jax.random.PRNGKey(0)

    # warm + compile outside the trace
    params, opt_state, metrics = step_fn(params, opt_state, batch, key)
    float(metrics["loss"])
    params, opt_state, metrics = step_fn(params, opt_state, batch, key)
    float(metrics["loss"])

    trace_dir = os.environ.get("PROF_DIR", "/tmp/merlot_prof")
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            params, opt_state, metrics = step_fn(params, opt_state, batch, key)
        float(metrics["loss"])  # host-transfer sync (axon: block is a no-op)
    print(f"{n_steps} steps traced in {time.time() - t0:.2f}s "
          f"({(time.time() - t0) / n_steps * 1000:.0f} ms/step incl. trace)")

    parse_trace(trace_dir)


if __name__ == "__main__":
    main()
