"""Fetch the released MERLOT TF checkpoints and convert them to our format.

The download_checkpoint.py analogue (reference: :10-29): the 4- and
5-segment pretrain checkpoints are published at
``gs://merlot/checkpoint_{4,5}segments/model.ckpt.*`` (public HTTPS mirror
``https://storage.googleapis.com/merlot/...``). After download, the TF1
variables are converted through merlot_tpu.tools.convert_tf_checkpoint into
an orbax checkpoint loadable by every driver here.
"""

from __future__ import annotations

import argparse
import os
import urllib.request

CKPT_FILES = ("model.ckpt.data-00000-of-00001", "model.ckpt.index",
              "model.ckpt.meta")
BASE = "https://storage.googleapis.com/merlot"


def download(segments: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    for fname in CKPT_FILES:
        url = f"{BASE}/checkpoint_{segments}segments/{fname}"
        dst = os.path.join(out_dir, fname)
        if os.path.exists(dst):
            print(f"exists: {dst}")
            continue
        print(f"downloading {url}")
        urllib.request.urlretrieve(url, dst)
    return os.path.join(out_dir, "model.ckpt")


def convert(ckpt_prefix: str, out_path: str, segments: int) -> None:
    import jax
    import orbax.checkpoint as ocp

    from merlot_tpu.models.config import MerlotConfig
    from merlot_tpu.tools.convert_tf_checkpoint import (
        convert_arrays, load_tf_checkpoint_arrays, merlot_tf_name_map)

    cfg = MerlotConfig(
        resnet_layers=(3, 4, 9), do_projection=True, do_bias=True,
        contrastive_size=768, num_chunks_in_group=4 if segments == 4 else 5,
        image_size=(192, 352) if segments == 4 else (384, 384))
    arrays = load_tf_checkpoint_arrays(ckpt_prefix)
    params = convert_arrays(arrays, merlot_tf_name_map(cfg))
    ocp.StandardCheckpointer().save(os.path.abspath(out_path),
                                    {"params": params})
    print(f"saved converted checkpoint to {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--segments", type=int, default=4, choices=(4, 5))
    ap.add_argument("--out_dir", default="checkpoints_tf")
    ap.add_argument("--converted", default=None,
                    help="also convert to an orbax checkpoint at this path")
    args = ap.parse_args(argv)
    prefix = download(args.segments, args.out_dir)
    if args.converted:
        convert(prefix, args.converted, args.segments)


if __name__ == "__main__":
    main()
