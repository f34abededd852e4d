from .checkpoint import Checkpoint, GlobalRNGState, save_pytree, load_pytree

__all__ = ["Checkpoint", "GlobalRNGState", "save_pytree", "load_pytree"]
