"""Video encoding for rollout recordings.

Counterpart of the reference's VideoRecorder encoding path
(``/root/reference/torchrl/record/recorder.py:43`` hands frames to
torchvision/moviepy writers).  Here: animated GIF via Pillow (always
available) and MP4 via an ``ffmpeg`` binary when present on PATH —
otherwise ``write_video`` falls back to GIF and says so.

Frames are ``[T, H, W, C]`` uint8 (HWC, TPU-native layout); float inputs
in [0, 1] are converted.
"""
from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

__all__ = ["write_gif", "write_mp4", "write_video"]


def _to_uint8_frames(video) -> np.ndarray:
    arr = np.asarray(video)
    if arr.ndim == 3:  # [T, H, W] grayscale
        arr = arr[..., None]
    if arr.ndim != 4:
        raise ValueError(f"expected [T, H, W, C] frames, got {arr.shape}")
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.0 else arr, 0, 255)
        arr = arr.astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, -1)
    return arr


def write_gif(video, path: str, fps: int = 30) -> str:
    """Encode ``[T, H, W, C]`` frames as an animated GIF (Pillow)."""
    from PIL import Image

    arr = _to_uint8_frames(video)
    frames = [Image.fromarray(f) for f in arr]
    duration = max(1, int(round(1000.0 / fps)))
    frames[0].save(
        path, save_all=True, append_images=frames[1:], duration=duration,
        loop=0,
    )
    return path


def write_mp4(video, path: str, fps: int = 30) -> str:
    """Encode frames as MP4 by piping raw RGB into ``ffmpeg``.

    Raises RuntimeError when no ffmpeg binary is on PATH (this image has
    none — use :func:`write_video` for the automatic GIF fallback).
    """
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("no ffmpeg binary on PATH; use write_gif")
    arr = _to_uint8_frames(video)
    T, H, W, _ = arr.shape
    cmd = [
        ffmpeg, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
        "-s", f"{W}x{H}", "-r", str(fps), "-i", "-",
        "-pix_fmt", "yuv420p", "-vcodec", "libx264", path,
    ]
    proc = subprocess.run(cmd, input=arr.tobytes(), capture_output=True)
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg failed: {proc.stderr[-500:]!r}")
    return path


def write_video(video, path: str, fps: int = 30) -> str:
    """Encode to the container implied by ``path``'s extension, falling
    back to GIF (with a .gif suffix swap) when mp4 encoding is
    unavailable."""
    if path.endswith(".gif"):
        return write_gif(video, path, fps)
    try:
        return write_mp4(video, path, fps)
    except RuntimeError:
        gif_path = os.path.splitext(path)[0] + ".gif"
        return write_gif(video, gif_path, fps)
