"""Pallas TPU kernels — the framework's native compute tier."""

from .frontend_kernel import extract_features_fused

__all__ = ["extract_features_fused"]
