"""sic_tpu — a TPU-native searchable generative image compression framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
CUDA/PyTorch codebase (lionl1106/Searchable-Generative-Image-Compression):

- ``container``  : the ``.c2df`` searchable-bitstream container format
- ``cpp``        : native (C++) host-side rANS entropy coder + CDF quantizer
- ``entropy``    : entropy models (Gaussian conditional coder, factorized
                   prior, four-part autoregressive spatial-channel prior)
- ``models``     : JAX/flax model zoo (TiTok ViT, Swin, ConvNeXt, DCVC blocks,
                   VQGAN, hybrid codec, CLIP towers, losses)
- ``ops``        : Pallas TPU kernels for the hot paths
- ``parallel``   : device-mesh sharding utilities (pjit / shard_map)
- ``retrieval``  : CLIP embedding codec + FAISS-flat-compatible vector index
- ``service``    : HTTP serving layer (same endpoint protocol as the reference)
- ``cli``        : compress / decompress / search / build / train entry points
- ``train``      : optax training harness with 3-stage schedule + rate control
"""

__version__ = "0.1.0"
