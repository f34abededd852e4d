from .safetanh import safetanh, safeatanh

__all__ = ["safetanh", "safeatanh"]
