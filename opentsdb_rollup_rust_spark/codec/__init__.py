from .gorilla import (  # noqa: F401
    encode_chunk_arrays,
    decode_chunk_arrays,
    decode_chunk_lanes,
    encode_chunks,
    decode_chunks,
    compression_stats,
)
