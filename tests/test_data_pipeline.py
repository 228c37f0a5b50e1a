"""Data pipeline tests: tfrecord round-trip (verified against TF's own
parser when available), image ops vs torch oracles, loader end-to-end."""

import os

import numpy as np
import pytest

from merlot_tpu.data import image_ops
from merlot_tpu.data.make_synthetic_tfrecord import write_synthetic_shard
from merlot_tpu.data.pretrain_loader import (PretrainLoader,
                                             collate_pretrain_batch,
                                             parse_pretrain_example,
                                             sample_shuffled_idx,
                                             shuffle_chunks)
from merlot_tpu.data.tfrecord import (TFRecordWriter, crc32c, encode_example,
                                      masked_crc, parse_example,
                                      read_tfrecords)

CONFIG = {
    "num_chunks": 4, "image_size": [64, 96], "chunk_text_len": 16,
    "clean_asr_prob": 0.5, "augment_prob": 0.8, "shuffle_chunks": True,
    "num_chunks_in_group": 2, "image_shuffle_prob": 0.5,
    "random_scale_max": 1.5, "random_scale_min": 1.125,
}


def test_crc32c_known_vectors():
    # public test vectors for CRC-32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330


def test_example_roundtrip_own_parser(tmp_path):
    feats = {
        "img": b"\x00\x01binary\xff",
        "toks": [1, 5, 50000, 0],
        "floats": [1.5, -2.25],
        "name": "hello",
    }
    payload = encode_example(feats)
    parsed = parse_example(payload)
    assert parsed["img"][0] == feats["img"]
    assert list(parsed["toks"]) == feats["toks"]
    np.testing.assert_allclose(parsed["floats"], [1.5, -2.25])
    assert parsed["name"][0] == b"hello"


def test_tfrecord_matches_tensorflow(tmp_path):
    """Our writer's bytes must parse with TF, and vice versa."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "x.tfrecord")
    feats = {"a": [1, 2, 3], "b": b"bytes!", "c": [0.5, 1.5]}
    with TFRecordWriter(path) as w:
        w.write(encode_example(feats))

    recs = list(tf.data.TFRecordDataset(path))
    assert len(recs) == 1
    ex = tf.train.Example()
    ex.ParseFromString(recs[0].numpy())
    assert list(ex.features.feature["a"].int64_list.value) == [1, 2, 3]
    assert ex.features.feature["b"].bytes_list.value[0] == b"bytes!"
    np.testing.assert_allclose(ex.features.feature["c"].float_list.value,
                               [0.5, 1.5])

    # TF-written record parses with our reader
    path2 = str(tmp_path / "y.tfrecord")
    with tf.io.TFRecordWriter(path2) as w:
        w.write(ex.SerializeToString())
    ours = parse_example(next(read_tfrecords(path2, verify_crc=True)))
    assert list(ours["a"]) == [1, 2, 3]
    assert ours["b"][0] == b"bytes!"


def test_resize_bilinear_matches_torch_align_corners(rng):
    import torch
    import torch.nn.functional as F
    img = rng.uniform(0, 1, (37, 53, 3)).astype(np.float32)
    got = image_ops.resize_bilinear_ac(img, 64, 96)
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    want = F.interpolate(t, size=(64, 96), mode="bilinear",
                         align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # and downscale
    got = image_ops.resize_bilinear_ac(img, 17, 20)
    want = F.interpolate(t, size=(17, 20), mode="bilinear",
                         align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_resize_pad_pixel_exact(rng):
    """The fused native resize+crop+pad must be PIXEL-EXACT vs the pure
    numpy bilinear reference (f32 math, no cv2 fixed-point, no FMA — the
    build uses -ffp-contract=off), for both f32 and u8 sources, with and
    without random-scale cropping."""
    if image_ops._native_resize is None:
        pytest.skip("native extension unavailable")
    u8 = rng.integers(0, 256, (75, 131, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    def numpy_ref(img_f32, size, **kw):
        # force the pure-numpy path: no native, no cv2
        old_nat, old_cv2 = image_ops._native_resize, image_ops._cv2
        image_ops._native_resize, image_ops._cv2 = None, None
        try:
            return image_ops.resize_and_pad(img_f32, size, **kw)
        finally:
            image_ops._native_resize, image_ops._cv2 = old_nat, old_cv2

    # eval path (no crop)
    for src in (u8, f32):
        got, info = image_ops.resize_and_pad(src, (64, 96))
        want, winfo = numpy_ref(f32, (64, 96))
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(info, winfo)

    # training path (random scale + crop): identical rng streams
    kw = dict(do_random_scale=True, random_scale_min=1.1,
              random_scale_max=1.6, resize_method="bilinear")
    got, info = image_ops.resize_and_pad(u8, (64, 96),
                                         rng=np.random.default_rng(7), **kw)
    want, winfo = numpy_ref(f32, (64, 96),
                            rng=np.random.default_rng(7), **kw)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(info, winfo)

    # downscale-to-pad path (scaled < desired on one axis)
    got, _ = image_ops.resize_and_pad(u8, (200, 96))
    want, _ = numpy_ref(f32, (200, 96))
    np.testing.assert_array_equal(got, want)


def test_resize_and_pad_shapes(rng):
    img = rng.uniform(0, 1, (100, 220, 3)).astype(np.float32)
    out, info = image_ops.resize_and_pad(img, (64, 96))
    assert out.shape == (64, 96, 3)
    # aspect preserved: scale = min(96/220, 64/100) = 0.4364 -> 43x96
    assert info[0] == 43 and info[1] == 96
    assert np.all(out[44:] == 0)  # bottom padding
    out2, _ = image_ops.resize_and_pad(img, (64, 96), rng=rng,
                                       do_random_scale=True,
                                       random_scale_min=1.125,
                                       random_scale_max=1.5,
                                       resize_method="random")
    assert out2.shape == (64, 96, 3)
    assert np.isfinite(out2).all()


def test_loader_end_to_end(tmp_path):
    path = str(tmp_path / "synth.tfrecord")
    write_synthetic_shard(path, num_examples=6, num_chunks=4, seed=1,
                          img_hw=(80, 120))
    loader = PretrainLoader([path], CONFIG, batch_size=2, is_training=True,
                            num_threads=2, shuffle_buffer=4, seed=3)
    batches = []
    for i, b in enumerate(loader):
        batches.append(b)
        if i >= 2:
            break
    b = batches[0]
    assert b["images"].shape == (2 * 4, 64, 96, 3)
    assert b["input_ids"].shape == (2, 4, 16)
    assert b["shuffled_idx_img"].shape == (2 * 4,)
    assert b["video_src_ids"].shape == (2, 4)
    assert b["images"].dtype == np.float32
    # bicubic resize may overshoot [0,1] slightly (the reference's
    # tf.image.resize bicubic does too and is not clipped)
    assert -0.5 <= b["images"].min() and b["images"].max() <= 1.5
    # start token is START(2) or NEXTCAPTION_START(5), per example
    starts = b["input_ids"][:, :, 0]
    assert set(np.unique(starts)) <= {2, 5}
    assert all(len(set(row)) == 1 for row in starts)  # consistent per example
    # video_src_ids nondecreasing-by-blocks after chunk shuffle: still a
    # valid mapping (each chunk has a video id < num_chunks)
    assert (b["video_src_ids"] >= 0).all() and (b["video_src_ids"] < 4).all()


def test_shuffle_chunks_keeps_blocks(rng):
    # one example, videos [0,0,1,1]: after shuffling, frames of the same
    # video must stay adjacent and in order
    batch = {
        "images": np.arange(4, dtype=np.float32).reshape(1, 4, 1, 1, 1),
        "input_ids": np.arange(4, dtype=np.int32).reshape(1, 4, 1),
        "is_eoc": np.array([[False, True, False, True]]),
        "video_src_ids": np.array([[0, 0, 1, 1]], np.int32),
        "mean_time": np.zeros((1, 4), np.float32),
        "chunk_num": np.arange(4, dtype=np.int32).reshape(1, 4),
    }
    seen = set()
    for seed in range(8):
        out = shuffle_chunks(batch, np.random.default_rng(seed))
        order = tuple(int(x) for x in out["input_ids"].reshape(-1))
        seen.add(order)
        assert order in ((0, 1, 2, 3), (2, 3, 0, 1))
    assert len(seen) == 2  # both block orders occur


def test_sample_shuffled_idx_distribution():
    rng = np.random.default_rng(0)
    idx = sample_shuffled_idx(200, 4, 4, shuffle_prob=0.5, shuffle_offset=16,
                              rng=rng).reshape(200, 4)
    shuffled_rows = (idx >= 16).any(1)
    # about half the groups get shuffled
    assert 0.35 < shuffled_rows.mean() < 0.65
    # unshuffled rows are identity
    for row in idx[~shuffled_rows]:
        assert list(row) == [0, 1, 2, 3]
    # shuffled rows: >= 2 frames moved (never exactly 1), values are a
    # permutation subset offset by 16
    for row in idx[shuffled_rows]:
        moved = (row >= 16).sum()
        assert moved >= 2


def test_native_jpeg_decode_matches_pil():
    """The C++ libjpeg decode path must be pixel-identical to PIL (same
    libjpeg family); decode_jpeg() prefers it and falls back to PIL."""
    import io

    import numpy as np
    from PIL import Image

    from merlot_tpu.data import image_ops

    if image_ops._native_decode is None:
        import pytest
        pytest.skip("native extension built without libjpeg")

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (70, 90, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    data = buf.getvalue()

    h, w, rgb = image_ops._native_decode(data)
    native = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(native, pil)

    via_api = image_ops.decode_jpeg(data)
    np.testing.assert_allclose(via_api, pil.astype(np.float32) / 255.0)


def test_threaded_device_put_iterator_propagates_errors():
    """A loader/transfer error in the worker thread must re-raise in the
    consumer (a swallowed error would silently truncate training)."""
    import pytest
    from merlot_tpu.data.pretrain_loader import device_put_iterator

    def src():
        yield {"x": np.ones((2, 2), np.float32)}
        raise RuntimeError("boom")

    it = device_put_iterator(src(), threaded=True)
    first = next(it)
    assert np.asarray(first["x"]).shape == (2, 2)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_threaded_device_put_iterator_end_of_stream():
    from merlot_tpu.data.pretrain_loader import device_put_iterator

    def src():
        for i in range(3):
            yield {"x": np.full((2,), i, np.float32)}

    got = [float(np.asarray(b["x"])[0])
           for b in device_put_iterator(src(), threaded=True)]
    assert got == [0.0, 1.0, 2.0]
