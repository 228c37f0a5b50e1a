"""Video frame extraction (offline preprocessing, host-side).

Parity target: data/video_utils.py (reference). The reference shells out to
ffmpeg via skvideo; skvideo isn't in this image, so we drive the ffmpeg
binary directly through subprocess with the same flags (seek-to-timestamp
single-frame reads with ``-ss t -frames:v 1 -q:v 2 -pix_fmt rgb24``,
4-thread fan-out for multi-frame extraction) and reimplement the black-bar
detection/trim (max 20% per side, intensity threshold) in numpy.

When the ffmpeg binary is absent, extraction falls back to OpenCV's
bundled decoders (cv2.VideoCapture with millisecond seeks) — same frame
semantics, no external binary. The whole pipeline (decode -> black-bar
trim -> chunking -> tfrecord) is exercised end-to-end in
tests/test_process.py on a cv2-synthesized video.
"""

from __future__ import annotations

import concurrent.futures
import shutil
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


# ----------------------------------------------------------------------
# cv2 fallback backend
# ----------------------------------------------------------------------
def _cv2_extract_at_times(video_file: str, times: Sequence[float]
                          ) -> List[Optional[np.ndarray]]:
    """Sequential millisecond-seek reads (one shared decoder; cv2 captures
    are not thread-safe, and offline extraction parallelizes across VIDEOS
    anyway, reference: data/process.py's per-video workers)."""
    import cv2
    cap = cv2.VideoCapture(video_file)
    frames: List[Optional[np.ndarray]] = []
    try:
        if not cap.isOpened():
            return [None] * len(times)
        for t in times:
            cap.set(cv2.CAP_PROP_POS_MSEC, max(t, 0.0) * 1000.0)
            ok, bgr = cap.read()
            frames.append(bgr[..., ::-1].copy() if ok else None)
    finally:
        cap.release()
    return frames


def _cv2_extract_fixed_fps(video_file: str, fps: float) -> np.ndarray:
    import cv2
    cap = cv2.VideoCapture(video_file)
    try:
        if not cap.isOpened():
            raise RuntimeError(f"cv2 cannot open {video_file}")
        native_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        duration = n / native_fps if native_fps else 0.0
    finally:
        cap.release()
    times = np.arange(0.0, max(duration, 1.0 / max(fps, 1e-6)), 1.0 / fps)
    frames = _cv2_extract_at_times(video_file, list(times))
    # fail LOUDLY on a dropped frame: silently skipping one would shift
    # every later frame's index off its timestamp (frame i must stay
    # t = i/fps for the chunk alignment downstream, like the ffmpeg path)
    missing = [i for i, f in enumerate(frames) if f is None]
    if missing:
        raise RuntimeError(
            f"cv2 failed to decode frames {missing[:5]}... of {video_file}")
    return np.stack(frames)


def detect_black_bars(frames: np.ndarray, blackbar_threshold: int = 16,
                      max_perc_to_trim: float = 0.2
                      ) -> Tuple[int, int, int, int]:
    """(y1, y2, x1, x2) content box over [N, H, W, 3] frames
    (reference: data/video_utils.py:7-32)."""
    has_content = frames.max(axis=(0, -1)) >= blackbar_threshold
    h, w = has_content.shape

    ys = np.where(has_content.any(1))[0]
    if ys.size == 0:
        ys = np.array([h // 2])
    y1 = min(int(ys[0]), int(h * max_perc_to_trim))
    y2 = max(int(ys[-1]) + 1, int(h * (1 - max_perc_to_trim)))

    xs = np.where(has_content.any(0))[0]
    if xs.size == 0:
        xs = np.array([w // 2])
    x1 = min(int(xs[0]), int(w * max_perc_to_trim))
    x2 = max(int(xs[-1]) + 1, int(w * (1 - max_perc_to_trim)))
    return y1, y2, x1, x2


def _probe_size(video_file: str) -> Tuple[int, int]:
    out = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0",
         "-show_entries", "stream=width,height", "-of", "csv=p=0", video_file],
        capture_output=True, check=True, text=True).stdout.strip()
    w, h = (int(x) for x in out.split(",")[:2])
    return w, h


def extract_single_frame(video_file: str, t: float,
                         size: Optional[Tuple[int, int]] = None
                         ) -> Optional[np.ndarray]:
    """Seek to timestamp t and decode one RGB frame
    (reference: :61-80)."""
    if not ffmpeg_available():
        return _cv2_extract_at_times(video_file, [t])[0]
    if size is None:
        size = _probe_size(video_file)
    w, h = size
    cmd = ["ffmpeg", "-ss", f"{t:.3f}", "-threads", "1", "-i", video_file,
           "-frames:v", "1", "-q:v", "2", "-f", "rawvideo",
           "-pix_fmt", "rgb24", "-v", "error", "pipe:1"]
    out = subprocess.run(cmd, capture_output=True).stdout
    if len(out) < w * h * 3:
        return None
    return np.frombuffer(out[:w * h * 3], np.uint8).reshape(h, w, 3)


def extract_frames_from_video(video_file: str, times: Sequence[float],
                              use_multithreading: bool = True,
                              blackbar_threshold: int = 32,
                              max_perc_to_trim: float = 0.2
                              ) -> Optional[np.ndarray]:
    """Frames at the given timestamps, black bars trimmed
    (reference: :82-126). Returns [N, H', W', 3] uint8 or None on failure."""
    if not ffmpeg_available():
        frames = _cv2_extract_at_times(video_file, times)
    else:
        size = _probe_size(video_file)

        def _one(i):
            return i, extract_single_frame(video_file, times[i], size)

        frames: List[Optional[np.ndarray]] = [None] * len(times)
        if use_multithreading:
            with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
                for fut in concurrent.futures.as_completed(
                        [pool.submit(_one, i) for i in range(len(times))]):
                    i, img = fut.result()
                    frames[i] = img
        else:
            for i in range(len(times)):
                frames[i] = _one(i)[1]

    if any(f is None for f in frames):
        return None
    stacked = np.stack(frames)
    y1, y2, x1, x2 = detect_black_bars(stacked, blackbar_threshold,
                                       max_perc_to_trim)
    return stacked[:, y1:y2, x1:x2]


def extract_all_frames(video_file: str, fps: float = 1.0,
                       blackbar_threshold: int = 32,
                       max_perc_to_trim: float = 0.2) -> np.ndarray:
    """Decode at a fixed rate (reference: :35-59 with -r 1)."""
    if not ffmpeg_available():
        frames = _cv2_extract_fixed_fps(video_file, fps)
        y1, y2, x1, x2 = detect_black_bars(frames, blackbar_threshold,
                                           max_perc_to_trim)
        return frames[:, y1:y2, x1:x2]
    w, h = _probe_size(video_file)
    cmd = ["ffmpeg", "-i", video_file, "-vf", f"fps={fps}", "-q:v", "2",
           "-f", "rawvideo", "-pix_fmt", "rgb24", "-v", "error", "pipe:1"]
    out = subprocess.run(cmd, capture_output=True).stdout
    n = len(out) // (w * h * 3)
    frames = np.frombuffer(out[:n * w * h * 3], np.uint8).reshape(n, h, w, 3)
    y1, y2, x1, x2 = detect_black_bars(frames, blackbar_threshold,
                                       max_perc_to_trim)
    return frames[:, y1:y2, x1:x2]


def get_size_for_resize(image_size: Tuple[int, int],
                        shorter_size_trg: int = 384,
                        longer_size_max: int = 512) -> Tuple[int, int]:
    """Target (w, h): shorter side -> shorter_size_trg unless the longer side
    would exceed longer_size_max (then shrink proportionally); never upscale
    (reference: utils/data_utils.py:104-133)."""
    w, h = image_size
    size = shorter_size_trg
    if min(w, h) <= size:
        return w, h
    if max(w, h) / min(w, h) * size > longer_size_max:
        size = int(round(longer_size_max * min(w, h) / max(w, h)))
    if (w <= h and w == size) or (h <= w and h == size):
        return w, h
    if w < h:
        return size, int(size * h / w)
    return int(size * w / h), size
