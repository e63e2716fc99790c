"""Pallas TPU kernels for the hot ops."""
from .rans_decode import pack_substreams, rans_decode_plane, split_substreams
from .seq_attention import seq_attention
from .window_attention import window_attention, window_attention_nhwc

__all__ = ["window_attention", "window_attention_nhwc", "seq_attention",
           "rans_decode_plane", "pack_substreams", "split_substreams"]
