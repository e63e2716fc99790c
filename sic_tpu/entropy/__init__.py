from .coder import EntropyCoder, RansEncoder, RansDecoder, pmf_to_quantized_cdf
from .factorized import BitEstimator, Bitparm, FactorizedCoder
from .huffman import HuffmanCodec, HuffmanCodecOneQP, build_huffman_table
from .tables import GaussianCdfTables, build_gaussian_tables, scale_table

__all__ = [
    "EntropyCoder",
    "RansEncoder",
    "RansDecoder",
    "pmf_to_quantized_cdf",
    "BitEstimator",
    "Bitparm",
    "FactorizedCoder",
    "HuffmanCodec",
    "HuffmanCodecOneQP",
    "build_huffman_table",
    "GaussianCdfTables",
    "build_gaussian_tables",
    "scale_table",
]
