"""Host-side PNG codec: decode to RGBA8 arrays, encode from pixels + filters.

Two implementations with the same byte-level behavior:
  * `pypng` — pure Python/numpy + zlib (correctness reference, always there)
  * `native` — C++ extension (zlib) for production throughput

`decode`/`encode` dispatch to the native codec when built, else pypng.
"""

from pngloss_tpu.codec.pypng import (
    Chunk,
    DecodedImage,
    PngDecodeError,
    TooLargeFile,
    decode,
    detect_colorspace,
    encode,
    msad_filter_choice,
    pack_pixels,
)

__all__ = [
    "Chunk",
    "DecodedImage",
    "PngDecodeError",
    "TooLargeFile",
    "decode",
    "encode",
    "detect_colorspace",
    "msad_filter_choice",
    "pack_pixels",
]
