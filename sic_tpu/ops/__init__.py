"""Pallas TPU kernels for the hot ops."""
from .window_attention import window_attention

__all__ = ["window_attention"]
