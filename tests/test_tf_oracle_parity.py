"""Numerical parity vs a TensorFlow oracle of the reference's exact math.

The released MERLOT checkpoint can't be downloaded here, so bit-fidelity is
checked structurally: this test re-expresses the reference's transformer
computation (utils/transformer.py + utils/model_utils.py) in plain TF2 ops —
same op sequence, same epsilons, same mask semantics, same erf gelu — loads
OUR initialized weights into it, and requires our TransformerEncoder to
match within fp32 tolerance. Ditto for the Grover residual layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from merlot_tpu.nn.transformer import TransformerEncoder, TransformerHParams

tf = pytest.importorskip("tensorflow")

H, NH, I, L = 32, 4, 64, 2  # hidden, heads, intermediate, layers
DH = H // NH


def tf_gelu(x):
    return x * 0.5 * (1.0 + tf.math.erf(x / np.sqrt(2.0)))


def tf_layer_norm(x, gamma, beta, eps=1e-5):
    mean, var = tf.nn.moments(x, axes=[-1], keepdims=True)
    scale = tf.math.rsqrt(var + eps) * gamma
    return x * scale - mean * scale + beta


def tf_attention(x, mask, p):
    """Reference attention_layer math (transformer.py:33-138)."""
    b, s, _ = x.shape

    def proj(name):
        y = tf.matmul(x, p[f"{name}/kernel"]) + p[f"{name}/bias"]
        y = tf.reshape(y, [b, s, NH, DH])
        return tf.transpose(y, [0, 2, 1, 3])

    q, k, v = proj("query"), proj("key"), proj("value")
    scores = tf.matmul(q, k, transpose_b=True) / np.sqrt(DH)
    m = mask[:, None]
    scores = scores * m - 1e10 * (1 - m)
    probs = tf.nn.softmax(scores)
    ctx = tf.transpose(tf.matmul(probs, v), [0, 2, 1, 3])
    ctx = tf.reshape(ctx, [b, s, H])
    return tf.matmul(ctx, p["out_proj/kernel"]) + p["out_proj/bias"]


def tf_transformer(x, mask, params, num_layers=L):
    """Reference pre-LN stack (transformer.py:171-247)."""
    for i in range(num_layers):
        p = params[f"layer{i:02d}"]
        attn_in = tf_layer_norm(x, p["attn_ln/gamma"], p["attn_ln/beta"])
        x = x + tf_attention(attn_in, mask, p)
        mlp_in = tf_layer_norm(x, p["mlp_ln/gamma"], p["mlp_ln/beta"])
        h0 = tf_gelu(tf.matmul(mlp_in, p["mlp/intermediate/kernel"])
                     + p["mlp/intermediate/bias"])
        x = x + tf.matmul(h0, p["mlp/output/kernel"]) + p["mlp/output/bias"]
    return tf_layer_norm(x, params["final_ln/gamma"], params["final_ln/beta"])


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def test_transformer_matches_tf_oracle(rng):
    hp = TransformerHParams(hidden_size=H, num_layers=L, num_heads=NH,
                            intermediate_size=I, hidden_dropout_prob=0.0,
                            dtype=jnp.float32)
    enc = TransformerEncoder(hp)
    x = rng.standard_normal((2, 7, H)).astype(np.float32)
    valid = rng.integers(0, 2, (2, 7)).astype(bool)
    valid[:, 0] = True
    mask = (valid[:, None] & valid[:, :, None]).astype(np.float32)

    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(mask))
    ours = np.asarray(enc.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                                # multiply-form to mirror the oracle exactly
                                collect="colsum")["hidden_state"])

    flat = _flatten(variables["params"])
    tf_params = {}
    for i in range(L):
        lp = {}
        for name in ("query", "key", "value", "out_proj"):
            lp[f"{name}/kernel"] = flat[f"layer{i:02d}/attention/{name}/kernel"]
            lp[f"{name}/bias"] = flat[f"layer{i:02d}/attention/{name}/bias"]
        for nm in ("attn_ln", "mlp_ln"):
            lp[f"{nm}/gamma"] = flat[f"layer{i:02d}/{nm}/gamma"]
            lp[f"{nm}/beta"] = flat[f"layer{i:02d}/{nm}/beta"]
        for nm in ("intermediate", "output"):
            lp[f"mlp/{nm}/kernel"] = flat[f"layer{i:02d}/mlp/{nm}/kernel"]
            lp[f"mlp/{nm}/bias"] = flat[f"layer{i:02d}/mlp/{nm}/bias"]
        tf_params[f"layer{i:02d}"] = lp
    tf_params["final_ln/gamma"] = flat["final_ln/gamma"]
    tf_params["final_ln/beta"] = flat["final_ln/beta"]

    want = tf_transformer(tf.constant(x), tf.constant(mask), tf_params).numpy()
    # fully-masked rows flow through identically here (same mask semantics)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)


def test_wsconv_matches_tf_oracle(rng):
    """conv2d_fixed_padding semantics (vision_transformer.py:30-66): WS in
    fp32, stride>1 = explicit symmetric pad + VALID, stride 1 = SAME."""
    from merlot_tpu.nn.layers import WSConv

    x = rng.standard_normal((2, 9, 11, 8)).astype(np.float32)
    for strides in (1, 2):
        conv = WSConv(16, 3, strides=strides, dtype=jnp.float32)
        variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(conv.apply(variables, jnp.asarray(x)))

        kern = np.asarray(variables["params"]["kernel"])
        mean = kern.mean(axis=(0, 1, 2), keepdims=True)
        var = kern.var(axis=(0, 1, 2), keepdims=True)
        kern = (kern - mean) / np.sqrt(var + 1e-5)
        xt = tf.constant(x)
        if strides > 1:
            xt = tf.pad(xt, [[0, 0], [1, 1], [1, 1], [0, 0]])
            want = tf.nn.conv2d(xt, kern, strides=[1, strides, strides, 1],
                                padding="VALID").numpy()
        else:
            want = tf.nn.conv2d(xt, kern, strides=[1, 1, 1, 1],
                                padding="SAME").numpy()
        np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)


def test_grover_layer_matches_tf_oracle(rng):
    """Reference Grover residual layout (lm/modeling.py:230-258, 495-510):
    attention on the UNNORMALIZED stream, then LN->mlp->LN(residual)."""
    from merlot_tpu.models.grover import GroverConfig, GroverLM

    cfg = GroverConfig(vocab_size=97, hidden_size=H, num_hidden_layers=1,
                       num_attention_heads=NH, intermediate_size=I,
                       max_position_embeddings=16, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    model = GroverLM(cfg)
    ids = rng.integers(1, 97, (2, 9)).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    ours_logits, _ = model.apply(variables, jnp.asarray(ids))
    ours = np.asarray(ours_logits)

    f = _flatten(variables["params"])
    x = tf.constant(f["word_embed"][ids] + f["pos_embed"][None, :9])
    x = tf_layer_norm(x, f["embed_norm/gamma"], f["embed_norm/beta"])
    causal = np.tril(np.ones((9, 9), np.float32))[None].repeat(2, 0)
    p = {f"{n}/kernel": f[f"layer00/{n}/kernel"] for n in
         ("query", "key", "value", "out_proj")}
    p.update({f"{n}/bias": f[f"layer00/{n}/bias"] for n in
              ("query", "key", "value", "out_proj")})
    attn = tf_attention(x, tf.constant(causal), p)
    xa = x + attn
    xn = tf_layer_norm(xa, f["layer00/mlp_ln0/gamma"], f["layer00/mlp_ln0/beta"])
    h0 = tf_gelu(tf.matmul(xn, f["layer00/intermediate/kernel"])
                 + f["layer00/intermediate/bias"])
    mlp = tf.matmul(h0, f["layer00/output/kernel"]) + f["layer00/output/bias"]
    hidden = tf_layer_norm(xa + mlp, f["layer00/mlp_ln1/gamma"],
                           f["layer00/mlp_ln1/beta"])
    want = tf.matmul(hidden, f["word_embed"], transpose_b=True).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)
