"""Zero-shot story-ordering CLI:
``python -m merlot_tpu.downstream.sort_story.get_zero_shot_logits config.yaml``

The get_zero_shot_logits.py analogue (reference: :16-115): loads the
5-segment pretrain checkpoint, runs every eval story through the temporal
head, dumps ``logits_val.h5``; then score with
``python -m merlot_tpu.downstream.sort_story.score_permutations logits_val.h5``.
"""

from __future__ import annotations

import os

from merlot_tpu.core.config import NeatConfig
from merlot_tpu.downstream.sort_story.dataloader import story_batches
from merlot_tpu.downstream.sort_story.zero_shot import run_zero_shot
from merlot_tpu.models.config import MerlotConfig
from merlot_tpu.train.checkpoint import CheckpointManager


def main(argv=None):
    config = NeatConfig.from_args("Zero-shot story ordering")
    num_chunks = config.data.get("num_chunks", 5)
    cfg = MerlotConfig.from_dict(config.model)
    assert (cfg.num_chunks_in_group or num_chunks) == num_chunks

    ckpt = CheckpointManager(os.path.join(config.device["output_dir"],
                                          "checkpoints"))
    latest = ckpt.latest_step()
    assert latest is not None, "no checkpoint found under output_dir"
    params = {"params": ckpt.restore(latest)["params"]}

    files = config.data.get("val_file_expanded") or []
    assert files, "data.val_file matched no files"
    batch_size = config.device.get("val_batch_size", 8)
    merged = {"num_chunks": num_chunks, "image_size": list(cfg.image_size)}

    split = config.data.get("split_name", "val")
    out_path = f"logits_{split}.h5"
    n = run_zero_shot(params, cfg,
                      story_batches(files, merged, batch_size),
                      out_path, batch_size=batch_size, num_chunks=num_chunks)
    print(f"wrote {n} stories to {out_path}")


if __name__ == "__main__":
    main()
