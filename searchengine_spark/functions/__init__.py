from searchengine_spark.functions.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)

__all__ = ["varint_encode", "varint_decode", "delta_encode", "delta_decode"]
