from .loggers import (
    Logger,
    CSVLogger,
    TensorboardLogger,
    WandbLogger,
    MLFlowLogger,
    generate_exp_name,
    get_logger,
)

__all__ = [
    "Logger",
    "CSVLogger",
    "TensorboardLogger",
    "WandbLogger",
    "MLFlowLogger",
    "generate_exp_name",
    "get_logger",
]

from .video import write_gif, write_mp4, write_video
