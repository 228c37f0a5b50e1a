"""Probe: ViT-tower LN-fusion fwd / fwd+bwd on the real chip."""
import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from merlot_tpu.nn.transformer import TransformerEncoder, TransformerHParams

mode = sys.argv[1]            # 'fwd' | 'bwd'
fuse = sys.argv[2] == '1'
nframes = int(os.environ.get('NF', '128'))
hp = TransformerHParams(hidden_size=768, num_layers=12, num_heads=12,
                        intermediate_size=3072, hidden_dropout_prob=0.0,
                        dtype=jnp.bfloat16, softmax_fp32=False,
                        fuse_ln_matmul=fuse)
enc = TransformerEncoder(hp)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (nframes, 266, 768)), jnp.bfloat16)
v = jax.jit(lambda x: enc.init(jax.random.PRNGKey(0), x, None))(x)

if mode == 'fwd':
    f = jax.jit(lambda v, x: enc.apply(v, x, None)["hidden_state"])
    def run():
        return f(v, x)
else:
    def loss(v, x):
        return jnp.sum(enc.apply(v, x, None)["hidden_state"].astype(jnp.float32))
    g = jax.jit(jax.grad(loss))
    def run():
        return g(v, x)

t0 = time.time()
out = run()
leaf = jax.tree_util.tree_leaves(out)[0]
float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))
print(f"compile+1st: {time.time()-t0:.1f}s", flush=True)
n = 10
t0 = time.time()
for _ in range(n):
    out = run()
leaf = jax.tree_util.tree_leaves(out)[0]
float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))
dt = (time.time() - t0) / n
print(f"mode={mode} fuse={fuse} {dt*1000:.2f} ms")
