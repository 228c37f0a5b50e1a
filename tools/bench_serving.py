"""Denoise-server load bench: concurrent requests vs the batching engine.

Drives a live in-process HTTP server with C concurrent clients issuing R
requests each and reports wall time, requests/s, latency percentiles, and
the engine's batching telemetry (sampler calls vs requests -> mean batch).
On the chip with grover-medium this quantifies the dynamic-batching win
(batch-8 decode is ~3-5x batch-1 aggregate, PERF.md); on CPU with the
tiny default config it demonstrates the mechanism.

Sweep mode runs every leg in ONE process because the persistent jax
compilation cache does not cover the axon remote-compile path — separate
processes re-pay every sampler compile (~40 s each over the tunnel),
swamping the serving signal. One process + an untimed warm pass per leg
keeps the jit caches hot, so the measured pass times serving, not XLA.

Usage (single leg):
    python tools/bench_serving.py [--config cfg.json] [--ckpt CKPT]
        [--clients 8] [--requests 4] [--batch_window 15] [--bf16]
Sweep (one process, warm+measured per leg; 0 window = engine off):
    python tools/bench_serving.py --config configs/grover_medium.json \
        --bf16 --top_p 0.01 --sweep 0x8,15x1,15x4,15x8,15x16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None,
                    help="GroverConfig json (default: tiny random model)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=4,
                    help="requests per client")
    ap.add_argument("--batch_window", type=float, default=15.0)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_len", type=int, default=96)
    ap.add_argument("--max_ctx", type=int, default=48)
    ap.add_argument("--top_p", type=float, default=0.94,
                    help="nucleus p; with RANDOM weights use <=0.01 so the "
                         "top-p prefilter stays on the fast path (see "
                         "tools/bench_grover_decode.py docstring)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--sweep", default=None,
                    help="comma list of WINDOWxCLIENTS legs, e.g. "
                         "'0x8,15x1,15x8' (window 0 = engine off); each leg "
                         "runs an untimed warm pass then a measured pass")
    args = ap.parse_args(argv)

    from http.server import ThreadingHTTPServer

    from merlot_tpu.tools.denoise_server import Denoiser, make_handler

    class Server(ThreadingHTTPServer):
        # default listen backlog (5) resets connections when >5 clients
        # connect in the same instant (observed at the 16-client leg)
        request_queue_size = 128

    cfg_path = args.config
    if cfg_path is None:
        f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump({"vocab_size": 50270, "hidden_size": 64,
                   "num_hidden_layers": 4, "num_attention_heads": 4,
                   "intermediate_size": 128,
                   "max_position_embeddings": 256}, f)
        f.close()
        cfg_path = f.name

    den = Denoiser(cfg_path, args.ckpt, max_len=args.max_len,
                   max_ctx=args.max_ctx, bf16=args.bf16, top_p=args.top_p,
                   batch_window_ms=max(args.batch_window, 1e-3),
                   max_batch=args.max_batch)
    engine = den.engine  # the sweep toggles den.engine per leg
    log_path = tempfile.mktemp(suffix=".jsonl")
    server = Server(("127.0.0.1", 0), make_handler(den, log_path))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def one(text):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/ask",
            data=json.dumps({"noisyasr": text}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=1200) as resp:
            return json.loads(resp.read())

    # warm the compile caches OUTSIDE the timed window
    one("warm up the kitchen")

    def run_pass(clients, requests, timed):
        errors = []
        latencies = []

        def client(i):
            try:
                for r in range(requests):
                    t = time.time()
                    one(f"client {i} request {r} " + "pasta " * (r % 3))
                    latencies.append(time.time() - t)
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        base_calls, base_reqs = ((den.engine.calls, den.engine.requests)
                                 if den.engine else (0, 0))
        t0 = time.time()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.time() - t0
        assert not errors, errors[:1]
        if not timed:
            return None

        total = clients * requests
        calls = (den.engine.calls - base_calls) if den.engine else total
        served = (den.engine.requests - base_reqs) if den.engine else total
        lat = sorted(latencies)
        return {
            "metric": "denoise_requests_per_sec",
            "value": round(total / dt, 3), "unit": "req/s",
            "clients": clients, "requests": total,
            "wall_s": round(dt, 2),
            "sampler_calls": calls,
            "mean_batch": round(served / max(calls, 1), 2),
            "batch_window_ms": (engine.window * 1000.0 if den.engine else 0.0),
            "p50_s": round(lat[len(lat) // 2], 2),
            "p95_s": round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 2),
        }

    if args.sweep:
        legs = []
        for leg in args.sweep.split(","):
            window, clients = leg.strip().split("x")
            legs.append((float(window), int(clients)))
        for window, clients in legs:
            den.engine = engine if window > 0 else None
            if den.engine:
                den.engine.window = window / 1000.0
            print(f"# leg window={window} clients={clients}: warm",
                  flush=True)
            run_pass(clients, args.requests, timed=False)
            print(f"# leg window={window} clients={clients}: measured",
                  flush=True)
            print(json.dumps(run_pass(clients, args.requests, timed=True)),
                  flush=True)
        den.engine = engine
    else:
        if args.batch_window <= 0:
            den.engine = None
        print(json.dumps(run_pass(args.clients, args.requests, timed=True)))
    server.shutdown()


if __name__ == "__main__":
    main()
