"""Video recording transforms.

Counterparts of the reference recorder stack
(``/root/reference/torchrl/record/recorder.py``: ``VideoRecorder`` :43,
``PixelRenderTransform`` :501).  The recorder buffers pixel frames on the
host (frames are pulled out of the jitted rollout output, not inside jit)
and flushes them to a logger's ``log_video``.
"""
from __future__ import annotations

from typing import Any

import numpy as np

from rl_tpu.data import TDict

__all__ = ["VideoRecorder", "TensorDictRecorder", "record_rollout_video"]


class VideoRecorder:
    """Accumulate frames from batch outputs and flush to a logger.

    Usage (eval-time, host-side)::

        rec = VideoRecorder(logger, tag="eval/video")
        _, ys, _ = env.rollout(T, policy, key=key)
        rec.capture(ys)          # pulls ("next", "pixels") frames
        rec.dump(step=frames)
    """

    def __init__(self, logger, *, tag: str = "video",
                 pixels_key=("next", "pixels"), max_frames: int = 1000,
                 fps: int = 30, upscale: int = 1):
        self.logger = logger
        self.tag = tag
        self.pixels_key = pixels_key
        self.max_frames = max_frames
        self.fps = fps
        self.upscale = int(upscale)
        self._frames: list[np.ndarray] = []

    def capture(self, batch: TDict, env_index: int = 0) -> None:
        px = np.asarray(batch[self.pixels_key])
        # [T, B?, H, W, C] -> [T, H, W, C] (first env of the batch)
        if px.ndim == 5:
            px = px[:, env_index]
        for frame in px[: self.max_frames - len(self._frames)]:
            self._frames.append(frame)

    def dump(self, step: int | None = None) -> np.ndarray | None:
        if not self._frames:
            return None
        vid = np.stack(self._frames)
        if vid.dtype != np.uint8:
            lo, hi = float(vid.min()), float(vid.max())
            vid = ((vid - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        if self.upscale > 1:
            vid = vid.repeat(self.upscale, axis=1).repeat(self.upscale, axis=2)
        if vid.shape[-1] == 1:
            vid = vid.repeat(3, axis=-1)
        if self.logger is not None:
            self.logger.log_video(self.tag, vid, step=step, fps=self.fps)
        self._frames = []
        return vid


def record_rollout_video(env, policy, logger, *, key, max_steps: int = 500,
                         tag: str = "rollout", pixels_key=("next", "pixels"),
                         upscale: int = 1, step: int | None = None):
    """One-call render: rollout → capture → dump (the ``rlrender`` flow,
    reference torchrl/render)."""
    _, ys, _ = env.rollout(max_steps, policy, key=key)
    rec = VideoRecorder(logger, tag=tag, pixels_key=pixels_key, upscale=upscale)
    rec.capture(ys)
    return rec.dump(step=step)


class TensorDictRecorder:
    """Buffer rollout TDicts on the host and dump them to ``.npz`` files
    (reference ``TensorDictRecorder`` record/recorder.py:433).

    ``capture`` takes a batch (e.g. a rollout's stacked output or a single
    step result), optionally selecting ``in_keys``, every ``skip``-th call;
    ``dump`` stacks and writes ``<out_file_base>_<iter>.npz`` with one array
    per (flattened) key.
    """

    def __init__(self, out_file_base: str, *, skip_reset: bool = True,
                 skip: int = 4, in_keys=None):
        self.out_file_base = str(out_file_base)
        self.skip_reset = skip_reset
        self.skip = int(skip)
        self.in_keys = list(in_keys) if in_keys else []
        self.td: list[TDict] = []
        self.count = 0
        self.iter = 0

    def capture(self, td: TDict) -> TDict:
        self.count += 1
        if self.count % self.skip == 0:
            sel = td.select(*self.in_keys, strict=False) if self.in_keys else td
            self.td.append(sel)
        return td

    __call__ = capture

    def dump(self, suffix: str | None = None) -> str | None:
        tds = self.td[1:] if (self.skip_reset and len(self.td) > 1) else self.td
        if not tds:
            return None
        name = (f"{self.out_file_base}_td_{self.iter}"
                + (f"_{suffix}" if suffix else "") + ".npz")
        arrays = {}
        keys = tds[0].keys(include_nested=True, leaves_only=True)
        for k in keys:
            flat = k if isinstance(k, str) else "/".join(k)
            arrays[flat] = np.stack([np.asarray(t[k]) for t in tds])
        np.savez(name, **arrays)
        self.iter += 1
        self.td.clear()
        self.count = 0
        return name
