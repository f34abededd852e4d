from .loggers import (
    Logger,
    CSVLogger,
    ProcessLogger,
    TensorboardLogger,
    WandbLogger,
    MLFlowLogger,
    generate_exp_name,
    get_logger,
)

__all__ = [
    "Logger",
    "CSVLogger",
    "ProcessLogger",
    "Every",
    "LoggerMonitor",
    "TensorboardLogger",
    "WandbLogger",
    "MLFlowLogger",
    "generate_exp_name",
    "get_logger",
]

from .video import (write_avi, write_gif, write_html, write_mp4,
                    write_notebook, write_trajectory_viewer, write_video)
from .monitoring import Every, LoggerMonitor
