"""Host-side image preprocessing (numpy).

Replaces the tf.image ops the reference delegates to TF's C++ kernels
(reference: model/dataloader.py:72-92, utils/model_utils.py:758-940).
Runs on host threads in the async loader; the TPU never sees raw JPEGs.

Bit-fidelity notes:
  * resize uses TF1 ``align_corners=True`` coordinate mapping
    (src = dst * (in-1)/(out-1)), verified against torch's
    ``F.interpolate(align_corners=True)`` in tests — NOT the half-pixel
    mapping cv2/PIL use.
  * integer casts truncate toward zero, matching tf.cast.
  * augmentations mirror the SimCLR-lite transforms
    (utils/model_utils.py:758-835) with numpy RNG.
"""

from __future__ import annotations

import io
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

RESIZE_METHODS = ("bilinear", "nearest", "bicubic", "area")


# ----------------------------------------------------------------------
# JPEG decode
# ----------------------------------------------------------------------
try:  # native libjpeg decode (GIL-released; bit-identical to PIL's output)
    from merlot_tpu.data._native import _merlot_native as _native

    _native_decode = getattr(_native, "decode_jpeg", None)
    _native_resize = getattr(_native, "resize_bilinear_pad", None)
except Exception:  # pragma: no cover - extension optional
    _native_decode = None
    _native_resize = None


def decode_jpeg_u8(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 RGB [H, W, 3]. Loaders that feed
    ``resize_and_pad`` should prefer this over ``decode_jpeg``: the native
    resize dequantizes u8 inline, skipping a full-image /255 pass."""
    if _native_decode is not None:
        try:
            h, w, rgb = _native_decode(data)
            return np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        except ValueError:
            pass  # odd colorspace (e.g. CMYK) -> PIL below
    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> float32 RGB in [0, 1] (tf.image.decode_jpeg + convert_image_dtype)."""
    return decode_jpeg_u8(data).astype(np.float32) / 255.0


# ----------------------------------------------------------------------
# align_corners=True resize
# ----------------------------------------------------------------------
def _ac_coords(out_size: int, in_size: int) -> np.ndarray:
    """align_corners source coordinates for one axis."""
    if out_size == 1:
        return np.zeros(1, dtype=np.float64)
    scale = (in_size - 1) / (out_size - 1)
    return np.arange(out_size, dtype=np.float64) * scale


try:
    import cv2 as _cv2
except ImportError:  # pragma: no cover
    _cv2 = None


def resize_bilinear_ac(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize with TF1 align_corners=True semantics. img [H, W, C] float.

    Fast path: cv2.remap with explicit align-corners source grids (exact
    same sampling points, SIMD interpolation, ~5x the numpy gather path)."""
    in_h, in_w = img.shape[:2]
    if (in_h, in_w) == (out_h, out_w):
        return img.astype(np.float32)
    if _cv2 is not None and out_h > 1 and out_w > 1:
        map_x = np.broadcast_to(_ac_coords(out_w, in_w).astype(np.float32)[None],
                                (out_h, out_w)).copy()
        map_y = np.broadcast_to(_ac_coords(out_h, in_h).astype(np.float32)[:, None],
                                (out_h, out_w)).copy()
        return _cv2.remap(img.astype(np.float32), map_x, map_y,
                          interpolation=_cv2.INTER_LINEAR,
                          borderMode=_cv2.BORDER_REPLICATE)
    ys = _ac_coords(out_h, in_h)
    xs = _ac_coords(out_w, in_w)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0).astype(np.float32)[:, None, None]
    wx = (xs - x0).astype(np.float32)[None, :, None]

    f = img.astype(np.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def resize_nearest_ac(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize with align_corners coordinate mapping."""
    in_h, in_w = img.shape[:2]
    ys = np.rint(_ac_coords(out_h, in_h)).astype(np.int64).clip(0, in_h - 1)
    xs = np.rint(_ac_coords(out_w, in_w)).astype(np.int64).clip(0, in_w - 1)
    return img[ys][:, xs].astype(np.float32)


def _resize_torch(img: np.ndarray, out_h: int, out_w: int, mode: str) -> np.ndarray:
    """bicubic / area resize via torch CPU (host pipeline only, never on TPU)."""
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(np.ascontiguousarray(img.astype(np.float32))).permute(2, 0, 1)[None]
    if mode == "bicubic":
        out = F.interpolate(t, size=(out_h, out_w), mode="bicubic", align_corners=True)
    elif mode == "area":
        out = F.interpolate(t, size=(out_h, out_w), mode="area")
    else:
        raise ValueError(mode)
    return out[0].permute(1, 2, 0).numpy()


def resize_ac(img: np.ndarray, out_h: int, out_w: int,
              method: str = "bilinear") -> np.ndarray:
    if method == "bilinear":
        return resize_bilinear_ac(img, out_h, out_w)
    if method == "nearest":
        return resize_nearest_ac(img, out_h, out_w)
    if method in ("bicubic", "area"):
        return _resize_torch(img, out_h, out_w, method)
    raise ValueError(f"unknown resize method {method}")


# ----------------------------------------------------------------------
# resize_and_pad (reference: utils/model_utils.py:855-940)
# ----------------------------------------------------------------------
def resize_and_pad(image: np.ndarray,
                   desired_output_size: Sequence[int],
                   rng: Optional[np.random.Generator] = None,
                   do_random_scale: bool = False,
                   random_scale_min: float = 0.1,
                   random_scale_max: float = 2.0,
                   resize_method: str = "bilinear",
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Aspect-preserving resize + random-scale crop + pad-to-fixed-size.

    ``image`` may be float32 [0, 1] or uint8 (preferred from
    ``decode_jpeg_u8``: the native bilinear dequantizes inline). Returns
    (image [dh, dw, 3] float32, image_info [5] float32 =
    [effective_h, effective_w, 1/scale, orig_h, orig_w]).
    """
    dh, dw = int(desired_output_size[0]), int(desired_output_size[1])
    h, w = float(image.shape[0]), float(image.shape[1])

    if do_random_scale:
        assert rng is not None
        f = rng.uniform(random_scale_min, random_scale_max)
        scaled_y = int(np.float32(f * dh))       # tf.cast truncation
        scaled_x = int(np.float32(f * dw))
        image_scale = min(scaled_x / w, scaled_y / h)
        # never scale the short side below 64 px
        image_scale = max(image_scale, 64.0 / min(h, w))
        scaled_h = int(np.float32(h * image_scale))
        scaled_w = int(np.float32(w * image_scale))
        off_y = int(np.float32(max(0.0, float(scaled_h - dh)) * rng.uniform(0, 1)))
        off_x = int(np.float32(max(0.0, float(scaled_w - dw)) * rng.uniform(0, 1)))
    else:
        image_scale = min(dw / w, dh / h)
        scaled_h = int(np.float32(h * image_scale))
        scaled_w = int(np.float32(w * image_scale))
        off_y = 0
        off_x = 0

    if resize_method == "random":
        assert rng is not None
        resize_method = RESIZE_METHODS[int(rng.integers(0, len(RESIZE_METHODS)))]

    if (resize_method == "bilinear" and _native_resize is not None
            and image.ndim == 3 and image.shape[2] == 3
            and image.dtype in (np.uint8, np.float32)
            and scaled_h > 1 and scaled_w > 1):
        # fused native path: bilinear + crop + zero-pad (+ u8 dequant) in
        # one GIL-released pass, bit-identical to the numpy reference
        # (tests/test_data_pipeline.py); identity resizes interpolate with
        # weight 0, which is exact
        src = np.ascontiguousarray(image)
        out = np.zeros((dh, dw, 3), dtype=np.float32)
        _native_resize(out, src, src.shape[0], src.shape[1],
                       int(src.dtype == np.uint8), scaled_h, scaled_w,
                       off_y, off_x, dh, dw)
        image_info = np.array([
            min(scaled_h, dh), min(scaled_w, dw), 1.0 / image_scale, h, w,
        ], dtype=np.float32)
        return out, image_info

    if image.dtype == np.uint8:
        image = image.astype(np.float32) / 255.0
    resized = resize_ac(image, scaled_h, scaled_w, method=resize_method)
    cropped = resized[off_y:off_y + dh, off_x:off_x + dw]

    out = np.zeros((dh, dw, image.shape[2]), dtype=np.float32)
    out[:cropped.shape[0], :cropped.shape[1]] = cropped

    image_info = np.array([
        min(scaled_h, dh), min(scaled_w, dw), 1.0 / image_scale, h, w,
    ], dtype=np.float32)
    return out, image_info


# ----------------------------------------------------------------------
# SimCLR-lite augmentations (reference: utils/model_utils.py:758-835)
# ----------------------------------------------------------------------
def _brightness(img: np.ndarray, rng: np.random.Generator, strength: float) -> np.ndarray:
    delta = 0.8 * strength
    factor = rng.uniform(1.0 - delta, 1.0 + delta, size=(1, 1, 3)).astype(np.float32)
    return img * factor

def _contrast(img: np.ndarray, rng: np.random.Generator, strength: float) -> np.ndarray:
    delta = 0.8 * strength
    factor = rng.uniform(1.0 - delta, 1.0 + delta, size=(1, 1, 3)).astype(np.float32)
    # channels-last flat reduce: ~5x faster than mean(axis=(0, 1)) on
    # strided HWC (the loader's hottest augment)
    mean = img.reshape(-1, img.shape[-1]).mean(axis=0).reshape(1, 1, -1)
    return (img - mean) * factor + mean

def _grayscale(img: np.ndarray, rng: np.random.Generator, strength: float) -> np.ndarray:
    return np.repeat(img.mean(axis=-1, keepdims=True), 3, axis=-1)

def _rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    import colorsys  # noqa: F401  (documenting intent; vectorized below)
    maxc = img.max(-1)
    minc = img.min(-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    dz = np.maximum(delta, 1e-12)
    h = np.where(maxc == r, (g - b) / dz % 6.0,
                 np.where(maxc == g, (b - r) / dz + 2.0, (r - g) / dz + 4.0))
    h = np.where(delta == 0, 0.0, h) / 6.0
    return np.stack([h, s, v], -1)

def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0] % 1.0, hsv[..., 1], hsv[..., 2]
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int64) % 6
    choices = np.stack([
        np.stack([v, t, p], -1), np.stack([q, v, p], -1), np.stack([p, v, t], -1),
        np.stack([p, q, v], -1), np.stack([p, t, v], -1), np.stack([v, p, q], -1),
    ], 0)
    return np.take_along_axis(choices, i[None, ..., None].repeat(3, -1), 0)[0]

def _hsb(img: np.ndarray, rng: np.random.Generator, strength: float) -> np.ndarray:
    sat = rng.uniform(1.0 - 0.8 * strength, 1.0 + 0.8 * strength)
    bri = rng.uniform(1.0 - 0.8 * strength, 1.0 + 0.8 * strength)
    hsv = _rgb_to_hsv(img) * np.array([1.0, sat, bri], dtype=np.float32)
    hue_add = rng.uniform(-0.1 * strength, 0.1 * strength)
    hsv[..., 0] += hue_add
    return _hsv_to_rgb(hsv).astype(np.float32)

_TRANSFORMS = {
    "brightness": _brightness,
    "contrast": _contrast,
    "hsb": _hsb,
    "grayscale": _grayscale,
}


def lightweight_image_augment(image: np.ndarray, rng: np.random.Generator,
                              strength: float = 0.4, augment_prob: float = 0.5,
                              allowed_transforms: str = "all") -> np.ndarray:
    """With prob augment_prob apply ONE randomly-chosen transform, clip to [0,1]."""
    if allowed_transforms == "all":
        names = list(_TRANSFORMS.keys())
    else:
        names = allowed_transforms.split(",")
    if rng.uniform() >= augment_prob:
        return image
    name = names[int(rng.integers(0, len(names)))]
    return np.clip(_TRANSFORMS[name](image, rng, strength), 0.0, 1.0).astype(np.float32)
