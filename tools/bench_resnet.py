"""Focused ResNet-stem probe: fwd and fwd+bwd at the pretrain shape.

The hybrid LiteResNet stem is the largest non-attention block of the
training step (88.8 ms of the 409 ms step at B8, PERF.md round 4).
Usage (on the chip):
    python tools/bench_resnet.py [n_frames]
Knobs: RESNET_GN_BWD=xhat|stats (ops/norms.py backward formulation),
RESNET_S2D=1 (stem conv0 as space-to-depth + 2x2 stride-1 — identical
math, MXU-friendlier contraction; layers.WSConv.space_to_depth).
"""

import os
import sys
import time

import numpy as np


def _host_sync(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def bench(f, *args, n=10):
    _host_sync(f(*args))
    t0 = time.time()
    out = None
    for _ in range(n):
        out = f(*args)
    _host_sync(out)
    return (time.time() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import os as _o
    import sys as _s
    _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
    from merlot_tpu.nn.vit import LiteResNet
    from merlot_tpu.ops import norms
    if os.environ.get("RESNET_GN_BWD"):
        norms.GN_BWD = os.environ["RESNET_GN_BWD"]
    print(f"GN_BWD={norms.GN_BWD}", flush=True)

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-0.5, 0.5, (n_frames, 192, 352, 3)),
                         jnp.float32)
    s2d = os.environ.get("RESNET_S2D", "0") == "1"
    print(f"stem_space_to_depth={s2d}", flush=True)
    rn = LiteResNet((3, 4, 9), dtype=jnp.bfloat16, stem_space_to_depth=s2d)
    v = jax.jit(lambda x: rn.init(jax.random.PRNGKey(0), x))(images)

    fwd = jax.jit(lambda v, x: rn.apply(v, x))
    t = bench(fwd, v, images)
    print(f"resnet fwd     : {t:8.1f} ms", flush=True)
    bwd = jax.jit(jax.grad(lambda v, x: jnp.sum(
        rn.apply(v, x).astype(jnp.float32) ** 2)))
    t = bench(bwd, v, images)
    print(f"resnet fwd+bwd : {t:8.1f} ms", flush=True)

    if os.environ.get("RESNET_PROF"):
        # per-fusion device-time breakdown of the fwd+bwd step (the data
        # for the VERDICT r3 #3 conv-layout decision)
        from tools.profile_step import parse_trace
        trace_dir = os.environ.get("PROF_DIR", "/tmp/resnet_prof")
        with jax.profiler.trace(trace_dir):
            out = None
            for _ in range(3):
                out = bwd(v, images)
            _host_sync(out)
        parse_trace(trace_dir, min_pct=0.3)


if __name__ == "__main__":
    main()
