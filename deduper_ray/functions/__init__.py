from deduper_ray.functions.hashing import (
    add_hash_columns,
    md5_hex_array,
    sha256_hex_array,
    stringify_columns,
)

__all__ = [
    "add_hash_columns",
    "md5_hex_array",
    "sha256_hex_array",
    "stringify_columns",
]
