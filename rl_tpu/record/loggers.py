"""Experiment loggers.

Counterparts of the reference logger stack
(``/root/reference/torchrl/record/loggers/``): ``Logger`` ABC common.py:186,
``CSVLogger`` csv.py:131, ``TensorboardLogger`` tensorboard.py:20,
``WandbLogger`` wandb.py:54, ``MLFlowLogger`` mlflow.py:28;
``generate_exp_name``/``get_logger`` utils.py:21,34.  Backends missing from
the environment degrade to clear ImportErrors at construction.
"""
from __future__ import annotations

import csv as _csv
import datetime
import json
import os
import uuid
from typing import Any, Sequence

import numpy as np

__all__ = [
    "Logger",
    "CSVLogger",
    "ProcessLogger",
    "TensorboardLogger",
    "WandbLogger",
    "MLFlowLogger",
    "generate_exp_name",
    "get_logger",
]


class Logger:
    """Abstract logger (reference common.py:186)."""

    def __init__(self, exp_name: str, log_dir: str | None = None):
        self.exp_name = exp_name
        self.log_dir = log_dir

    def log_scalar(self, name: str, value: float, step: int | None = None) -> None:
        raise NotImplementedError

    def log_video(self, name: str, video, step: int | None = None, fps: int = 30) -> None:
        raise NotImplementedError

    def log_hparams(self, cfg: dict) -> None:
        raise NotImplementedError

    def log_histogram(self, name: str, data, step: int | None = None) -> None:
        pass

    def close(self) -> None:
        pass


class CSVLogger(Logger):
    """Filesystem logger (reference csv.py:131): scalars to csv, videos to
    .npy, hparams to json."""

    def __init__(self, exp_name: str, log_dir: str = "csv_logs"):
        super().__init__(exp_name, log_dir)
        self.root = os.path.join(log_dir, exp_name)
        os.makedirs(os.path.join(self.root, "scalars"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "videos"), exist_ok=True)
        self._files: dict[str, Any] = {}

    def log_scalar(self, name: str, value, step=None):
        safe = name.replace("/", "_")
        path = os.path.join(self.root, "scalars", f"{safe}.csv")
        new = not os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = _csv.writer(f)
            if new:
                w.writerow(["step", "value"])
            w.writerow([step, float(value)])

    def log_video(self, name: str, video, step=None, fps: int = 30):
        safe = name.replace("/", "_")
        base = os.path.join(self.root, "videos", f"{safe}_{step or 0}")
        np.save(base + ".npy", np.asarray(video))
        try:
            from .video import write_gif

            write_gif(video, base + ".gif", fps=fps)
        except Exception:  # encoding is best-effort; the npy is canonical
            pass

    def log_hparams(self, cfg: dict):
        with open(os.path.join(self.root, "hparams.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    def read_scalar(self, name: str):
        safe = name.replace("/", "_")
        path = os.path.join(self.root, "scalars", f"{safe}.csv")
        with open(path) as f:
            rows = list(_csv.reader(f))[1:]
        return [(r[0], float(r[1])) for r in rows]


class TensorboardLogger(Logger):
    """Reference tensorboard.py:20 (tensorboardX backend)."""

    def __init__(self, exp_name: str, log_dir: str = "tb_logs"):
        super().__init__(exp_name, log_dir)
        from tensorboardX import SummaryWriter

        self._writer = SummaryWriter(os.path.join(log_dir, exp_name))

    def log_scalar(self, name, value, step=None):
        self._writer.add_scalar(name, float(value), global_step=step)

    def log_video(self, name, video, step=None, fps: int = 30):
        vid = np.asarray(video)
        if vid.ndim == 4:  # [T, H, W, C] -> [1, T, C, H, W]
            vid = vid.transpose(0, 3, 1, 2)[None]
        self._writer.add_video(name, vid, global_step=step, fps=fps)

    def log_hparams(self, cfg: dict):
        flat = {k: v for k, v in cfg.items() if isinstance(v, (int, float, str, bool))}
        self._writer.add_hparams(flat, {})

    def log_histogram(self, name, data, step=None):
        self._writer.add_histogram(name, np.asarray(data), global_step=step)

    def close(self):
        self._writer.close()


class WandbLogger(Logger):
    """Reference wandb.py:54; requires the (absent here) wandb package."""

    def __init__(self, exp_name: str, project: str | None = None, **kwargs):
        super().__init__(exp_name)
        import wandb  # raises if unavailable

        self._run = wandb.init(project=project, name=exp_name, **kwargs)

    def log_scalar(self, name, value, step=None):
        self._run.log({name: float(value)}, step=step)

    def log_video(self, name, video, step=None, fps: int = 30):
        import wandb

        self._run.log({name: wandb.Video(np.asarray(video), fps=fps)}, step=step)

    def log_hparams(self, cfg: dict):
        self._run.config.update(cfg)

    def close(self):
        self._run.finish()


class MLFlowLogger(Logger):
    """Reference mlflow.py:28; requires the (absent here) mlflow package."""

    def __init__(self, exp_name: str, tracking_uri: str | None = None):
        super().__init__(exp_name)
        import mlflow

        self._mlflow = mlflow
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        mlflow.set_experiment(exp_name)
        self._run = mlflow.start_run()

    def log_scalar(self, name, value, step=None):
        self._mlflow.log_metric(name.replace("/", "_"), float(value), step=step)

    def log_hparams(self, cfg: dict):
        self._mlflow.log_params(cfg)

    def close(self):
        self._mlflow.end_run()


def generate_exp_name(model_name: str, experiment_name: str) -> str:
    """Reference utils.py:21."""
    ts = datetime.datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
    return f"{model_name}_{experiment_name}_{ts}_{uuid.uuid4().hex[:6]}"


def get_logger(logger_type: str, logger_name: str, experiment_name: str, **kwargs) -> Logger | None:
    """Reference utils.py:34."""
    if logger_type in (None, "", "none"):
        return None
    if logger_type == "csv":
        return CSVLogger(experiment_name, logger_name, **kwargs)
    if logger_type == "tensorboard":
        return TensorboardLogger(experiment_name, logger_name, **kwargs)
    if logger_type == "wandb":
        return WandbLogger(experiment_name, **kwargs)
    if logger_type == "mlflow":
        return MLFlowLogger(experiment_name, **kwargs)
    raise ValueError(f"unknown logger_type {logger_type}")


class ProcessLogger(Logger):
    """Cross-process logger proxy (reference loggers/process.py:110/132).

    Worker processes can't (or shouldn't) open their own logger backends;
    ``ProcessLogger.client()`` returns a picklable handle that forwards
    ``log_scalar``/``log_hparams`` records through an mp.Queue, drained by
    a daemon thread in the owning process into the wrapped logger.
    """

    def __init__(self, logger: Logger, ctx=None):
        super().__init__(logger.exp_name)
        import multiprocessing as mp
        import threading

        self._logger = logger
        self._queue = (ctx or mp.get_context("spawn")).Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self):
        import queue as _q

        while not self._stop.is_set():
            try:
                kind, payload = self._queue.get(timeout=0.2)
            except (_q.Empty, OSError, EOFError):
                continue
            if kind == "scalar":
                self._logger.log_scalar(*payload)
            elif kind == "hparams":
                self._logger.log_hparams(payload)

    def client(self) -> "_ProcessLoggerClient":
        """Picklable worker-side handle (reference _LoggerClient)."""
        return _ProcessLoggerClient(self._queue)

    def log_scalar(self, name, value, step=None):
        self._logger.log_scalar(name, value, step=step)

    def log_hparams(self, cfg: dict):
        self._logger.log_hparams(cfg)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2.0)
        if hasattr(self._logger, "close"):
            self._logger.close()


class _ProcessLoggerClient:
    def __init__(self, queue):
        self._queue = queue

    def log_scalar(self, name, value, step=None):
        self._queue.put(("scalar", (name, float(value), step)))

    def log_hparams(self, cfg: dict):
        self._queue.put(("hparams", dict(cfg)))
