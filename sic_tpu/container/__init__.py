from .c2df import pack_c2df, unpack_c2df, sanitize_enc_result_types

__all__ = ["pack_c2df", "unpack_c2df", "sanitize_enc_result_types"]
