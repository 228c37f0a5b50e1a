"""Component-level TPU timing: where does the train-step time go?

Times fwd and fwd+bwd of each tower separately at pretrain shapes
(per-chip batch B examples x 16 chunks, merlot.yaml dims), plus the
optimizer update, to guide kernel work. Run on the chip:
    python tools/bench_components.py [B]
"""

import sys
import time

import numpy as np


def _host_sync(out):
    """block_until_ready is a no-op over the axon tunnel; a host transfer of
    one element is the only reliable sync."""
    import jax
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def bench(f, *args, n=10):
    _host_sync(f(*args))  # warm (exec reaches the device)
    t0 = time.time()
    out = None
    for _ in range(n):
        out = f(*args)
    _host_sync(out)  # device executes sequentially; last output gates all
    return (time.time() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    import sys as _s, os as _o
    _s.path.insert(0, _o.path.dirname(_o.path.dirname(_o.path.abspath(__file__))))
    from __graft_entry__ import _flagship_config
    from merlot_tpu.models.merlot import MerlotModel
    from merlot_tpu.nn.transformer import TransformerEncoder, TransformerHParams
    from merlot_tpu.nn.vit import VisionBackbone

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = _flagship_config()
    rng = np.random.default_rng(0)
    n_frames = B * 16
    print(f"per-chip batch={B} examples = {n_frames} frames", flush=True)

    hp = TransformerHParams(hidden_size=768, num_layers=12, num_heads=12,
                            intermediate_size=3072, hidden_dropout_prob=0.0,
                            dtype=jnp.bfloat16)
    vb = VisionBackbone(patch_size=16, hidden_size=768, num_cls_emb=2,
                        resnet_layers=(3, 4, 9), spatial_pool_size=2,
                        vit_hp=hp)
    images = jnp.asarray(rng.uniform(0, 1, (n_frames, 192, 352, 3)), jnp.float32)
    v = jax.jit(lambda x: vb.init(jax.random.PRNGKey(0), x))(images)

    fwd = jax.jit(lambda v, x: vb.apply(v, x)["cls"])
    t = bench(fwd, v, images)
    print(f"vision fwd       : {t:8.1f} ms  ({n_frames / t * 1000:.0f} frames/s)", flush=True)

    grad = jax.jit(jax.grad(lambda v, x: jnp.sum(
        vb.apply(v, x)["cls"].astype(jnp.float32) ** 2)))
    t_vb = bench(grad, v, images)
    print(f"vision fwd+bwd   : {t_vb:8.1f} ms", flush=True)

    # resnet alone
    from merlot_tpu.nn.vit import LiteResNet
    rn = LiteResNet((3, 4, 9), dtype=jnp.bfloat16)
    vr = jax.jit(lambda x: rn.init(jax.random.PRNGKey(0), x))(images)
    t = bench(jax.jit(lambda v, x: rn.apply(v, x)), vr, images)
    print(f"  resnet fwd     : {t:8.1f} ms", flush=True)
    t = bench(jax.jit(jax.grad(lambda v, x: jnp.sum(
        rn.apply(v, x).astype(jnp.float32) ** 2))), vr, images)
    print(f"  resnet fwd+bwd : {t:8.1f} ms", flush=True)

    # lang tower (collect=colsum) at [B, 512]
    enc = TransformerEncoder(hp)
    x = jnp.asarray(rng.standard_normal((B, 512, 768)), jnp.bfloat16)
    mask = jnp.ones((B, 512, 512), jnp.float32)
    ve = jax.jit(lambda x, m: enc.init(jax.random.PRNGKey(0), x, m))(x, mask)
    t = bench(jax.jit(lambda v, x, m: enc.apply(v, x, m, collect="colsum")["hidden_state"]), ve, x, mask)
    print(f"lang fwd(colsum) : {t:8.1f} ms", flush=True)
    t = bench(jax.jit(jax.grad(lambda v, x, m: jnp.sum(
        enc.apply(v, x, m, collect="colsum")["hidden_state"].astype(jnp.float32) ** 2),
        argnums=0)), ve, x, mask)
    print(f"lang fwd+bwd     : {t:8.1f} ms", flush=True)

    # joint encoder at [B*4, 396]
    xj = jnp.asarray(rng.standard_normal((B * 4, 396, 768)), jnp.bfloat16)
    maskj = jnp.ones((B * 4, 396, 396), jnp.float32)
    vj = jax.jit(lambda x, m: enc.init(jax.random.PRNGKey(0), x, m))(xj, maskj)
    t = bench(jax.jit(lambda v, x, m: enc.apply(v, x, m)["hidden_state"]), vj, xj, maskj)
    print(f"joint fwd        : {t:8.1f} ms", flush=True)
    t = bench(jax.jit(jax.grad(lambda v, x, m: jnp.sum(
        enc.apply(v, x, m)["hidden_state"].astype(jnp.float32) ** 2),
        argnums=0)), vj, xj, maskj)
    print(f"joint fwd+bwd    : {t:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
