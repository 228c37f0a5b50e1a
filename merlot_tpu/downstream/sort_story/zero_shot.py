"""Zero-shot visual story ordering via the pretrained temporal head.

Parity target: downstream/sort_story/get_zero_shot_logits.py (reference).
Per batch:
  * duplicate each example ``duplication_factor`` (=2) times;
  * assign each duplicate a FIXED-SEED random frame-PE permutation with
    offset +64 (so the model treats every frame as "shuffled"; the exact
    "unkN" assignment is averaged out over duplicates — reference: :34-66);
  * run MerlotModel (no masking), pool CLS states per segment, reuse the
    pretrained ``lang_viz`` / ``viz_viz`` temporal heads;
  * softmax over classes 1..3 (same / earlier / later), mean over duplicates
  * dump per-story probs to h5.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.models.merlot import MerlotModel

DUPLICATION_FACTOR = 2
SHUFFLE_OFFSET = 64


def make_zero_shot_fn(cfg: MerlotConfig, batch_size: int, num_chunks: int,
                      duplication_factor: int = DUPLICATION_FACTOR):
    """Build (model, jitted fn): (params, images, sentences) ->
    {lang_viz_probs, viz_viz_probs} of [batch, g, g, 3]."""
    cfg = cfg.eval_mode()
    model = MerlotModel(cfg)
    group = cfg.num_chunks_in_group or num_chunks
    assert group == num_chunks, "zero-shot uses one group per story"

    # fixed-seed permutations, +64 offset (reference: :55-56)
    key = jax.random.fold_in(jax.random.PRNGKey(123), 1234)
    fixed_u = jax.random.uniform(
        key, (batch_size * duplication_factor * num_chunks,))
    shuffled_idx = (jnp.argsort(
        fixed_u.reshape(batch_size * duplication_factor, num_chunks), axis=1)
        .astype(jnp.int32) + SHUFFLE_OFFSET)

    def _prep(images, sentences):
        # images [batch, 5, h, w, 3]; sentences [batch, 5, 32]
        imgs = jnp.tile(images, (duplication_factor, 1, 1, 1, 1))
        sents = jnp.tile(sentences, (duplication_factor, 1, 1))
        b2, n, h, w, _ = imgs.shape
        return imgs.reshape(b2 * n, h, w, 3), sents

    def fn(params, images, sentences):
        imgs, sents = _prep(images, sentences)

        from merlot_tpu.ops.attention import inference_backend

        def run(mdl):
            fwd = mdl(imgs, sents[:, :, :32], mask_input=False,
                      shuffled_idx_img=shuffled_idx, deterministic=True,
                      attn_backend=inference_backend())
            s = fwd["shapes"]
            h_lang = fwd["encoder_hidden_states"]["lang"].reshape(
                s["B"], s["group"], s["lang_chunk_len"], cfg.hidden_size)[:, :, 0]
            h_viz = fwd["encoder_hidden_states"]["viz"].reshape(
                s["B"], s["group"], s["viz_chunk_len"], cfg.hidden_size)[:, :, 0]
            out = {}
            for name, xa in (("lang_viz", h_lang), ("viz_viz", h_viz)):
                logits = mdl.temporal_logits(xa, h_viz, which=name)
                probs = jax.nn.softmax(logits, -1)[:, 1:]  # classes 1..3
                probs = probs.reshape(batch_size, duplication_factor,
                                      num_chunks, num_chunks, 3)
                out[f"{name}_probs"] = jnp.mean(probs, axis=1)
            return out

        return model.apply(params, method=lambda mdl: run(mdl))

    def init_fn(key, images, sentences):
        """Init that creates ALL params the zero-shot path touches (forward
        + temporal heads) — for tests / random-weight runs; real runs load a
        pretrain checkpoint whose tree already contains the heads."""
        imgs, sents = _prep(images, sentences)

        def run_init(mdl):
            fwd = mdl(imgs, sents[:, :, :32], mask_input=False,
                      shuffled_idx_img=shuffled_idx, deterministic=True)
            s = fwd["shapes"]
            h_lang = fwd["encoder_hidden_states"]["lang"].reshape(
                s["B"], s["group"], s["lang_chunk_len"], cfg.hidden_size)[:, :, 0]
            h_viz = fwd["encoder_hidden_states"]["viz"].reshape(
                s["B"], s["group"], s["viz_chunk_len"], cfg.hidden_size)[:, :, 0]
            mdl.temporal_logits(h_lang, h_viz, which="lang_viz")
            mdl.temporal_logits(h_viz, h_viz, which="viz_viz")
            return 0

        return model.init(key, method=lambda mdl: run_init(mdl))

    return model, jax.jit(fn), init_fn


def run_zero_shot(params, cfg: MerlotConfig, batches: Iterable[Dict[str, Any]],
                  h5_path: str, batch_size: int, num_chunks: int = 5) -> int:
    """Drive batches through the zero-shot fn, dump per-story h5 groups.

    Data-parallel over all visible devices when the story batch divides
    the device count (the reference ran PREDICT on a whole TPU slice).
    story_batches only yields FULL batches — write eval shards with
    --pad_to_batch_size so no tail stories are dropped."""
    import h5py

    _, fn, _ = make_zero_shot_fn(cfg, batch_size, num_chunks)
    put = jnp.asarray
    ndev = len(jax.devices())
    if ndev > 1 and batch_size % ndev == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from merlot_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=ndev, model=1)
        params = jax.device_put(params, NamedSharding(mesh, P()))
        data_s = NamedSharding(mesh, P("data"))

        def put(x):
            # device_put straight from host memory — staging through
            # jnp.asarray would land the whole batch on device 0 first
            return jax.device_put(np.asarray(x), data_s)
    n = 0
    with h5py.File(h5_path, "w") as h5:
        for batch in batches:
            out = jax.device_get(fn(params,
                                    put(batch["images"]),
                                    put(batch["sentences"])))
            for i in range(batch_size):
                sid = str(int(batch["story_id"][i]))
                if sid in h5:
                    continue  # replica padding repeats the last story
                grp = h5.create_group(sid)
                grp.create_dataset("permutation_identity_encode",
                                   data=int(batch["permutation_identity_encode"][i]))
                grp.create_dataset("sentences", data=batch["sentences"][i])
                for name in ("lang_viz", "viz_viz"):
                    grp.create_dataset(f"{name}_probs",
                                       data=out[f"{name}_probs"][i])
                n += 1
    return n
