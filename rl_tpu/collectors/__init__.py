from .collector import Collector, split_trajectories

__all__ = ["Collector", "split_trajectories"]
