"""Enumerate the reference MerlotModel's TF1 variable names and shapes.

Purpose (VERDICT r1, item 1): the converter's name map
(tools/convert_tf_checkpoint.py) was derived by *reading* the reference's
variable-scope conventions — in particular the anonymous ``conv2d_N`` /
``GroupNorm_N`` enumeration inside each ResNet block group was an educated
guess. The released checkpoint (gs://merlot) is unreachable from this box
(zero egress), so this module validates the map the other independent way:
it imports the reference's OWN graph-building code (read-only oracle, never
copied) under a tf.compat.v1 + contrib shim, builds the full pretraining
graph at the real merlot.yaml configuration, and returns every
``tf.global_variables()`` name + shape. Those names are by construction the
names in the released checkpoint (the reference saves via TPUEstimator →
plain variable names, reference: model/train.py + utils/neat_config.py).

Run as a module for a JSON dump:
    python -m merlot_tpu.tools.tf1_name_oracle [--config merlot.yaml] [--vcr]
"""

from __future__ import annotations

import argparse
import json
import sys
import types
from typing import Dict, List, Tuple

REFERENCE_ROOT = "/root/reference"


def _install_shims() -> "types.ModuleType":
    """Make `import tensorflow as tf` inside the reference resolve to
    tf.compat.v1, and satisfy its TF1.15-era module-level imports
    (tensorflow.contrib.tpu.*, pytz). Returns the tf1 module."""
    import os

    # tf.compat.v1.layers (the reference's conv/dense builder) only exists
    # with legacy Keras 2 (tf_keras); Keras 3 raises on every v1 layer.
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    import tensorflow as tf_real

    tf1 = tf_real.compat.v1
    tf1.disable_eager_execution()
    tf1.disable_v2_behavior()

    def fake_module(name: str, **attrs) -> types.ModuleType:
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    # tensorflow.contrib.tpu.python.{ops.tpu_ops, tpu.tpu_function}
    # (model_utils.py:24-25). Only two symbols are touched by graph
    # construction: get_tpu_context().number_of_shards (None => the
    # single-shard degradation of tpu_cross_replica_stack,
    # model_utils.py:680-683) and cross_replica_sum (never reached when
    # number_of_shards is None).
    class _TpuContext:
        number_of_shards = None

    fake_module("tensorflow.contrib")
    fake_module("tensorflow.contrib.tpu")
    fake_module("tensorflow.contrib.tpu.python")
    fake_module("tensorflow.contrib.tpu.python.ops")
    fake_module("tensorflow.contrib.tpu.python.ops.tpu_ops",
                cross_replica_sum=lambda x, *a, **k: x)
    fake_module("tensorflow.contrib.tpu.python.tpu")
    fake_module("tensorflow.contrib.tpu.python.tpu.tpu_function",
                get_tpu_context=lambda: _TpuContext())
    sys.modules["tensorflow.contrib"].tpu = \
        sys.modules["tensorflow.contrib.tpu"]

    # pytz: neat_config.py imports it for a log timestamp only.
    if "pytz" not in sys.modules:
        class _Tz:
            def __init__(self, name):
                self.name = name
        fake_module("pytz", timezone=lambda name: _Tz(name))

    # The reference does `import tensorflow as tf` and uses the 1.x API
    # surface; compat.v1 provides all of it. Submodule imports
    # (tensorflow.python.*, tensorflow.compiler.*) still resolve through
    # the already-imported real package entries in sys.modules.
    sys.modules["tensorflow"] = tf1
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return tf1


def reference_variables(config_path: str = f"{REFERENCE_ROOT}/model/configs/merlot.yaml",
                        batch_size: int = 4,
                        include_vcr_heads: bool = False,
                        config_overrides: Dict | None = None,
                        ) -> List[Tuple[str, Tuple[int, ...]]]:
    """Build the reference pretraining graph and list its variables.

    Returns [(name_without_:0, shape), ...] for every global variable
    (global_step excluded). Must run in a fresh process if real TF2 graph
    work happens elsewhere (the shim rebinds sys.modules['tensorflow'])."""
    import numpy as np
    import yaml

    tf1 = _install_shims()

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    model_cfg = dict(cfg["model"])
    model_cfg.setdefault("use_bfloat16", False)  # getter casts, names identical
    model_cfg["use_bfloat16"] = False  # fp32 graph builds faster; same scopes
    if config_overrides:
        model_cfg.update(config_overrides)

    from model.modeling import MerlotModel  # the reference's own builder

    h, w = model_cfg["image_size"]
    num_chunks = model_cfg.get("num_chunks_in_group", 4)
    # one group per example keeps the graph small; grouping only reshapes,
    # scopes are unaffected (modeling.py:171 builds 'encoder' once)
    seq_len = model_cfg.get("lang_chunk_length", 32)

    g = tf1.Graph()
    with g.as_default():
        image = tf1.placeholder(tf1.float32, [batch_size * num_chunks, h, w, 3])
        input_ids = tf1.placeholder(
            tf1.int32, [batch_size, num_chunks, seq_len])
        shuffled_idx = tf1.placeholder(tf1.int32, [batch_size, num_chunks])
        video_src = tf1.placeholder(tf1.int32, [batch_size, num_chunks])

        model = MerlotModel(config=model_cfg, is_training=True, use_tpu=False,
                            image=image, input_ids=input_ids, mask_input=True,
                            shuffled_idx_img=shuffled_idx,
                            log_attention_probs=False)
        model.mask_loss()
        model.contrastive_loss()
        if model_cfg.get("temporal_coef", 1.0) > 0.0:
            model.temporal_loss(shuffled_idx, video_src_ids=video_src)

        if include_vcr_heads:
            # reference: downstream/vcr/modeling.py:86-120 — per head two
            # dense layers 'classifier_mlp0' (H/2, gelu) + 'classifier_mlp1'
            # (1, prior-bias init) under {answer,rationale}_cls scopes
            from utils.model_utils import gelu as ref_gelu
            from utils.transformer import create_initializer
            cls_h = tf1.placeholder(tf1.float32,
                                    [batch_size, model_cfg["hidden_size"]])
            for mode in ("answer", "rationale"):
                with tf1.variable_scope(f"{mode}_cls"):
                    h0 = tf1.layers.dense(
                        cls_h, model_cfg["hidden_size"] // 2,
                        activation=ref_gelu,
                        kernel_initializer=create_initializer(
                            model_cfg["initializer_range"]),
                        name="classifier_mlp0")
                    tf1.layers.dense(
                        h0, 1,
                        kernel_initializer=create_initializer(
                            model_cfg["initializer_range"]),
                        name="classifier_mlp1")

        out = []
        for v in tf1.global_variables():
            name = v.name.split(":")[0]
            if name == "global_step":
                continue
            out.append((name, tuple(int(d) for d in v.shape)))
    return out


def reference_forward_dump(out_npz: str,
                           config_path: str = f"{REFERENCE_ROOT}/model/configs/merlot.yaml",
                           batch_size: int = 1,
                           config_overrides: Dict | None = None,
                           seed: int = 0,
                           restore_ckpt: str | None = None) -> None:
    """Run the reference model forward (its own code, its own random init)
    and dump weights + inputs + outputs to ``out_npz``.

    This is the composition-level parity oracle (VERDICT r1 item 1 / weak 6):
    the graph is the reference's PREDICT path from
    downstream/sort_story/get_zero_shot_logits.py:58-84 — MerlotModel
    inference forward, CLS pooling, and both allpairs temporal heads — in
    fp32 on CPU. tests/test_reference_parity.py converts the dumped weights
    through merlot_tf_name_map, replays the same inputs through our model,
    and compares encoder_hidden_states and allpairs_temporal_logits.
    """
    import numpy as np
    import yaml

    tf1 = _install_shims()

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    model_cfg = dict(cfg["model"])
    model_cfg["use_bfloat16"] = False  # fp32 parity run
    if config_overrides:
        model_cfg.update(config_overrides)

    from model.modeling import MerlotModel

    h, w = model_cfg["image_size"]
    num_chunks = model_cfg.get("num_chunks_in_group", 4)
    seq_len = 32

    rng = np.random.default_rng(seed)
    images_np = rng.uniform(0.0, 1.0,
                            (batch_size * num_chunks, h, w, 3)).astype(np.float32)
    ids_np = rng.integers(100, model_cfg["vocab_size"] - 20,
                          (batch_size, num_chunks, seq_len)).astype(np.int32)
    # fixed permutation + the zero-shot +64 offset (get_zero_shot_logits.py:56)
    shuffled_np = np.stack([rng.permutation(num_chunks)
                            for _ in range(batch_size)]).astype(np.int32) + 64

    g = tf1.Graph()
    with g.as_default():
        tf1.set_random_seed(seed)
        image = tf1.placeholder(tf1.float32, images_np.shape)
        input_ids = tf1.placeholder(tf1.int32, ids_np.shape)
        shuffled_idx = tf1.placeholder(tf1.int32, shuffled_np.shape)

        model = MerlotModel(config=model_cfg, is_training=False,
                            use_tpu=False, image=image, input_ids=input_ids,
                            mask_input=False, shuffled_idx_img=shuffled_idx,
                            log_attention_probs=False)
        # CLS pooling + allpairs heads exactly as the zero-shot driver
        # (get_zero_shot_logits.py:68-80)
        h_lang = tf1.reshape(
            model.encoder_hidden_states["lang"],
            [model.B, model.num_chunks_in_group, model.lang_chunk_length,
             model.hidden_size])[:, :, 0]
        h_viz = tf1.reshape(
            model.encoder_hidden_states["viz"],
            [model.B, model.num_chunks_in_group, model.viz_chunk_length,
             model.hidden_size])[:, :, 0]
        fetches = {
            "hidden_lang": tf1.cast(model.encoder_hidden_states["lang"],
                                    tf1.float32),
            "hidden_viz": tf1.cast(model.encoder_hidden_states["viz"],
                                   tf1.float32),
        }
        for name, xa in (("lang_viz", h_lang), ("viz_viz", h_viz)):
            fetches[f"allpairs_{name}"] = model.allpairs_temporal_logits(
                xa=xa, xb=h_viz, scope_name=f"{name}_temporal")
        # tied-embedding LM head on a fixed slice of lang positions (the
        # mask-LM sampling itself is stochastic; this pins the head math)
        lm_in = tf1.reshape(model.encoder_hidden_states["lang"],
                            [-1, model.hidden_size])[:8]
        fetches["lm_logits8"] = model.lm_head(lm_in)

        feed = {image: images_np, input_ids: ids_np, shuffled_idx: shuffled_np}
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            if restore_ckpt:
                # released-weights mode: overwrite the random init with the
                # real checkpoint (name-intersection, like the reference's
                # warm start, utils/model_utils.py:388-413)
                tf1.train.Saver().restore(sess, restore_ckpt)
            outs = sess.run(fetches, feed)
            var_vals = {}
            for v in tf1.global_variables():
                name = v.name.split(":")[0]
                if name != "global_step":
                    var_vals[f"var:{name}"] = sess.run(v)

    payload = dict(var_vals)
    payload.update({f"out:{k}": v for k, v in outs.items()})
    payload.update({"in:images": images_np, "in:input_ids": ids_np,
                    "in:shuffled_idx_img": shuffled_np})
    np.savez(out_npz, **payload)
    print(f"dumped {len(var_vals)} vars + {len(outs)} outputs to {out_npz}",
          file=sys.stderr)


def grover_reference_variables(
        config_path: str = f"{REFERENCE_ROOT}/data/groverdenoise/lm/configs/medium.json",
        batch_size: int = 2, seq_len: int = 16,
        ) -> List[Tuple[str, Tuple[int, ...]]]:
    """Same oracle for the Grover denoiser LM (reference:
    data/groverdenoise/lm/modeling.py:424-540, scope tree 'newslm/...')."""
    tf1 = _install_shims()
    grover_root = f"{REFERENCE_ROOT}/data/groverdenoise"
    if grover_root not in sys.path:
        sys.path.insert(0, grover_root)
    from lm.modeling import GroverConfig, GroverModel

    cfg = GroverConfig.from_json_file(config_path)
    g = tf1.Graph()
    with g.as_default():
        input_ids = tf1.placeholder(tf1.int32, [batch_size, seq_len])
        GroverModel(config=cfg, is_training=True, input_ids=input_ids)
        out = []
        for v in tf1.global_variables():
            name = v.name.split(":")[0]
            if name == "global_step":
                continue
            out.append((name, tuple(int(d) for d in v.shape)))
    return out


def vcr_forward_dump(out_npz: str,
                     config_path: str = f"{REFERENCE_ROOT}/model/configs/merlot_vcr.yaml",
                     batch_size: int = 1,
                     config_overrides: Dict | None = None,
                     seed: int = 0) -> None:
    """VCR-shaped forward oracle: MerlotModel in the reference's VCR eval
    configuration (downstream/vcr/modeling.py:40-76 — 2-D input_ids,
    num_texts=4 image duplication, answer head on the lang CLS) from its
    random init, in fp32. Exercises the num_imgs/num_texts tiling path the
    pretrain-shaped parity dump never touches (model/modeling.py:95-130).
    """
    import math

    import numpy as np
    import yaml

    tf1 = _install_shims()

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    model_cfg = dict(cfg["model"])
    model_cfg["use_bfloat16"] = False
    if config_overrides:
        model_cfg.update(config_overrides)

    from model.modeling import MerlotModel
    from utils.model_utils import gelu as ref_gelu
    from utils.transformer import create_initializer

    h, w = model_cfg["image_size"]
    num_texts = model_cfg.get("num_texts", 4)
    seq_len = 184

    rng = np.random.default_rng(seed)
    images_np = rng.uniform(0.0, 1.0, (batch_size, h, w, 3)).astype(np.float32)
    ids_np = rng.integers(100, model_cfg["vocab_size"] - 20,
                          (batch_size * num_texts, seq_len)).astype(np.int32)

    g = tf1.Graph()
    with g.as_default():
        tf1.set_random_seed(seed)
        image = tf1.placeholder(tf1.float32, images_np.shape)
        input_ids = tf1.placeholder(tf1.int32, ids_np.shape)
        model = MerlotModel(config=model_cfg, is_training=False,
                            use_tpu=False, image=image, input_ids=input_ids,
                            mask_input=False, log_attention_probs=False)
        h0 = tf1.cast(model.encoder_hidden_states["lang"],
                      tf1.float32)[:, 0, :]
        with tf1.variable_scope("answer_cls"):
            hid = tf1.layers.dense(
                h0, model_cfg["hidden_size"] // 2, activation=ref_gelu,
                kernel_initializer=create_initializer(
                    model_cfg["initializer_range"]),
                name="classifier_mlp0")
            logits = tf1.layers.dense(
                hid, 1,
                kernel_initializer=create_initializer(
                    model_cfg["initializer_range"]),
                bias_initializer=tf1.constant_initializer(
                    -math.log(3.0)),  # bias_pi=0.25
                name="classifier_mlp1")
        fetches = {
            "hidden_lang": tf1.cast(model.encoder_hidden_states["lang"],
                                    tf1.float32),
            "answer_logits": tf1.reshape(logits,
                                         [batch_size, num_texts]),
        }
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            outs = sess.run(fetches, {image: images_np, input_ids: ids_np})
            var_vals = {f"var:{v.name.split(':')[0]}": sess.run(v)
                        for v in tf1.global_variables()
                        if v.name.split(":")[0] != "global_step"}

    payload = dict(var_vals)
    payload.update({f"out:{k}": v for k, v in outs.items()})
    payload.update({"in:images": images_np, "in:input_ids": ids_np})
    np.savez(out_npz, **payload)
    print(f"dumped {len(var_vals)} vcr vars + outputs to {out_npz}",
          file=sys.stderr)


def grover_forward_dump(out_npz: str,
                        config_path: str = f"{REFERENCE_ROOT}/data/groverdenoise/lm/configs/medium.json",
                        batch_size: int = 2, seq_len: int = 24,
                        seed: int = 0) -> None:
    """Grover analogue of reference_forward_dump: the reference's own
    GroverModel (lm/modeling.py:424-540) forward from its random init, in
    fp32, weights + inputs + (hidden_state, logits) dumped to npz."""
    import numpy as np

    tf1 = _install_shims()
    grover_root = f"{REFERENCE_ROOT}/data/groverdenoise"
    if grover_root not in sys.path:
        sys.path.insert(0, grover_root)
    from lm.modeling import GroverConfig, GroverModel

    cfg = GroverConfig.from_json_file(config_path)
    rng = np.random.default_rng(seed)
    ids_np = rng.integers(10, cfg.vocab_size - 10,
                          (batch_size, seq_len)).astype(np.int32)

    g = tf1.Graph()
    with g.as_default():
        tf1.set_random_seed(seed)
        input_ids = tf1.placeholder(tf1.int32, ids_np.shape)
        model = GroverModel(config=cfg, is_training=False,
                            input_ids=input_ids, chop_off_last_token=False)
        fetches = {
            "hidden_flat": model.hidden_state,   # [B*S, H]
            "logits_flat": model.logits_flat,    # [B*S, vocab]
        }
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            outs = sess.run(fetches, {input_ids: ids_np})
            var_vals = {f"var:{v.name.split(':')[0]}": sess.run(v)
                        for v in tf1.global_variables()
                        if v.name.split(":")[0] != "global_step"}

    payload = dict(var_vals)
    payload.update({f"out:{k}": v for k, v in outs.items()})
    payload["in:input_ids"] = ids_np
    np.savez(out_npz, **payload)
    print(f"dumped {len(var_vals)} grover vars + outputs to {out_npz}",
          file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    default=f"{REFERENCE_ROOT}/model/configs/merlot.yaml")
    ap.add_argument("--vcr", action="store_true",
                    help="also build the VCR answer/rationale heads")
    ap.add_argument("--out", default="-")
    ap.add_argument("--forward-dump", default=None, metavar="OUT_NPZ",
                    help="run the fp32 forward oracle instead of the name dump")
    ap.add_argument("--grover-forward-dump", default=None, metavar="OUT_NPZ",
                    help="run the Grover LM forward oracle")
    ap.add_argument("--vcr-forward-dump", default=None, metavar="OUT_NPZ",
                    help="run the VCR-shaped (num_texts=4) forward oracle")
    ap.add_argument("--seq-len", type=int, default=24)
    ap.add_argument("--overrides", default=None,
                    help="JSON dict of model-config overrides")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--restore-ckpt", default=None,
                    help="restore this TF checkpoint before the forward dump")
    args = ap.parse_args()
    overrides = json.loads(args.overrides) if args.overrides else None
    if args.grover_forward_dump:
        grover_forward_dump(args.grover_forward_dump, args.config,
                            batch_size=args.batch_size,
                            seq_len=args.seq_len)
        return
    if args.vcr_forward_dump:
        vcr_forward_dump(args.vcr_forward_dump, args.config,
                         batch_size=args.batch_size,
                         config_overrides=overrides)
        return
    if args.forward_dump:
        reference_forward_dump(args.forward_dump, args.config,
                               batch_size=args.batch_size,
                               config_overrides=overrides,
                               restore_ckpt=args.restore_ckpt)
        return
    names = reference_variables(args.config, include_vcr_heads=args.vcr,
                                config_overrides=overrides)
    payload = json.dumps({n: list(s) for n, s in names}, indent=1,
                         sort_keys=True)
    if args.out == "-":
        print(payload)
    else:
        with open(args.out, "w") as f:
            f.write(payload)
        print(f"wrote {len(names)} variables to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
