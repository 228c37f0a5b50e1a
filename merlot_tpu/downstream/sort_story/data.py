"""sort_story (VIST/SIND) tfrecord preparation.

Parity target: downstream/sort_story/data/make_tfrecord.py (reference).
Each story = 5 images + 5 sentences; for eval we emit **all 5! = 120
permutations** per story (or just the identity), with the permutation
encoded as ``int(''.join(perm)) + 900000``. Keys:
  permutation_identity_encode, story_id,
  sentence/sentence_{i} (int64 token ids),
  image/image_{i}_encoded / _format / _sha256 / _is_valid.

The VIST download itself (SIS-with-labels.tar.gz + flickr image tars,
reference: data/download.py) requires network access; this module takes the
already-downloaded story json + image dir.
"""

from __future__ import annotations

import collections
import hashlib
import io
import itertools
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from merlot_tpu.core.tokenizer import get_tokenizer
from merlot_tpu.data.tfrecord import TFRecordWriter, encode_example


def _to_jpeg(image) -> bytes:
    if image.mode == "RGBA":
        image = image.convert("RGB")
    with io.BytesIO() as out:
        image.save(out, format="JPEG", quality=95)
        return out.getvalue()


def load_stories(story_json_path: str) -> Dict[int, List[dict]]:
    """story_id -> 5 annotations sorted by worker photo order."""
    with open(story_json_path) as f:
        data = json.load(f)
    by_story = collections.defaultdict(list)
    for ann in data["annotations"]:
        ann = ann[0]
        by_story[int(ann["story_id"])].append(ann)
    out = {}
    for sid, anns in by_story.items():
        assert len(anns) == 5
        out[sid] = sorted(anns, key=lambda a: a["worker_arranged_photo_order"])
    return out


def story_example(story_id: int, texts: Sequence[Sequence[int]],
                  jpegs: Sequence[bytes], perm: Sequence[int]) -> bytes:
    """Serialize one (story, permutation) Example in the reference schema."""
    perm_encode = int("".join(str(x) for x in perm)) + 900000
    feats = {"permutation_identity_encode": [perm_encode],
             "story_id": [int(story_id)]}
    for out_idx, src_idx in enumerate(perm):
        feats[f"sentence/sentence_{out_idx}"] = list(texts[src_idx])
        feats[f"image/image_{out_idx}_encoded"] = jpegs[src_idx]
        feats[f"image/image_{out_idx}_format"] = b"jpeg"
        feats[f"image/image_{out_idx}_sha256"] = hashlib.sha256(
            jpegs[src_idx]).hexdigest().encode()
        feats[f"image/image_{out_idx}_is_valid"] = [1]
    return encode_example(feats)


def write_story_tfrecords(story_json_path: str, image_directory: str,
                          out_path: str, just_one_perm: bool = False,
                          fold: int = 0, num_folds: int = 1,
                          pad_to_batch_size: Optional[int] = None) -> int:
    """Write (story x permutation) examples for one fold. Returns count."""
    from PIL import Image
    tok = get_tokenizer()
    stories = load_stories(story_json_path)
    paths = {p.split(".")[0]: os.path.join(image_directory, p)
             for p in os.listdir(image_directory)}

    n = 0
    last = None
    with TFRecordWriter(out_path) as w:
        for idx, sid in enumerate(sorted(stories.keys())):
            if idx % num_folds != fold:
                continue
            anns = stories[sid]
            texts = [tok.encode(a["original_text"]) for a in anns]
            jpegs = []
            for a in anns:
                img = Image.open(paths[a["photo_flickr_id"]])
                img.thumbnail((800, 800))
                jpegs.append(_to_jpeg(img))
            perms = ([range(5)] if just_one_perm
                     else itertools.permutations(range(5)))
            for perm in perms:
                last = story_example(sid, texts, jpegs, list(perm))
                w.write(last)
                n += 1
        # eval batches are fixed-size: pad the final shard with replicas
        if pad_to_batch_size and last is not None:
            extra = (-n) % pad_to_batch_size
            for _ in range(extra):
                w.write(last)
                n += 1
    return n


def main(argv=None):
    """CLI: VIST SIS json + image dir -> permutation tfrecords, fold-parallel
    (the make_tfrecord.py analogue; run one process per fold)."""
    import argparse
    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--story_json", required=True)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--num_folds", type=int, default=1)
    ap.add_argument("--just_one_perm", action="store_true")
    ap.add_argument("--pad_to_batch_size", type=int, default=None)
    args = ap.parse_args(argv)
    n = write_story_tfrecords(args.story_json, args.image_dir, args.out,
                              just_one_perm=args.just_one_perm,
                              fold=args.fold, num_folds=args.num_folds,
                              pad_to_batch_size=args.pad_to_batch_size)
    print(f"wrote {n} examples to {args.out}")


def write_synthetic_story_shard(path: str, num_stories: int = 2,
                                just_one_perm: bool = True, seed: int = 0,
                                img_hw=(64, 80)) -> int:
    """Synthetic stories for tests (same schema, random images/sentences)."""
    from merlot_tpu.data.make_synthetic_tfrecord import _random_jpeg
    rng = np.random.default_rng(seed)
    n = 0
    with TFRecordWriter(path) as w:
        for sid in range(num_stories):
            texts = [list(rng.integers(100, 50357, int(rng.integers(4, 20))))
                     for _ in range(5)]
            jpegs = [_random_jpeg(rng, *img_hw) for _ in range(5)]
            perms = ([range(5)] if just_one_perm
                     else itertools.permutations(range(5)))
            for perm in perms:
                w.write(story_example(sid, texts, jpegs, list(perm)))
                n += 1
    return n


if __name__ == "__main__":
    main()
