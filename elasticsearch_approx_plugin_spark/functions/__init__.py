from .tokenize import CODE_TOKEN_RE, tokenize_code, tokenize_ws
from .varint import varint_decode, varint_encode, delta_varint_encode, delta_varint_decode
from .hll import HLL_DEFAULT_P, hll_estimate, hll_merge, hll_new, hll_add_hashes, p_for_rsd
from .sketch import CountThenEstimate

__all__ = [
    "CODE_TOKEN_RE",
    "tokenize_code",
    "tokenize_ws",
    "varint_encode",
    "varint_decode",
    "delta_varint_encode",
    "delta_varint_decode",
    "HLL_DEFAULT_P",
    "p_for_rsd",
    "hll_new",
    "hll_add_hashes",
    "hll_merge",
    "hll_estimate",
    "CountThenEstimate",
]
