"""JAX/flax model zoo for the searchable generative codec."""
from .bottleneck import BottleneckCoder, CompressiveBottleneck
from .codec import Codec, CodecRuntime, CodecSpec, get_padding_size, init_codec, pad_replicate
from .convnext import ConvNeXtBlock
from .cross import InteractiveCrossAttn
from .dcvc import ConvFFN3, DepthConv, DepthConvBlock4
from .hybrid import (FeatMerge, HybridCodec, HybridDecoder, HybridEncoder,
                     PixelShuffle, TiTokSpec)
from .layers import MLP, MultiheadSelfAttention, ResidualAttentionBlock
from .maskgit_vqgan import (MaskGITVQGANSpec, PixelDecoder, PixelEncoder,
                            PixelQuantizer, PixelResnetBlock)
from .titok import (PretrainedTokenizer, TiTok, TiTokDecoderViT,
                    TiTokEncoderViT, inverse_img_stack, make_img_stack)
from .quantizer import L2VectorQuantizer, VQGANQuantizer
from .swin import SwinBlock, SwinStack, WindowAttention
from .vqgan import VQGAN, Decoder, Encoder, VQGANSpec

__all__ = [
    "BottleneckCoder", "CompressiveBottleneck", "Codec", "CodecRuntime",
    "CodecSpec", "get_padding_size", "init_codec", "pad_replicate",
    "ConvNeXtBlock", "InteractiveCrossAttn", "ConvFFN3", "DepthConv",
    "DepthConvBlock4", "FeatMerge", "HybridCodec", "HybridDecoder",
    "HybridEncoder", "PixelShuffle", "TiTokSpec", "MLP",
    "MultiheadSelfAttention", "ResidualAttentionBlock", "L2VectorQuantizer",
    "VQGANQuantizer", "SwinBlock", "SwinStack", "WindowAttention", "VQGAN",
    "Decoder", "Encoder", "VQGANSpec", "MaskGITVQGANSpec", "PixelDecoder",
    "PixelEncoder", "PixelQuantizer", "PixelResnetBlock",
    "PretrainedTokenizer", "TiTok", "TiTokDecoderViT", "TiTokEncoderViT",
    "inverse_img_stack", "make_img_stack",
]
