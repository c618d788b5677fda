"""Malformed-PNG generation shared by the probe and the fuzz loop.

The reference gets its malformed-input behavior from libpng 1.6 (error
vs benign-error vs warn-and-discard policies, rwpng.c:639-659 longjmp
recovery, rwpng.c:287-290 overflow guards).  This module produces (a) a
DETERMINISTIC catalog of malformed-category specimens used as regression
probes, and (b) RANDOM mutations of valid PNGs for the differential
fuzzer (tools/fuzz_loop.py --malformed).

Nothing here imports jax; generation is pure numpy/zlib.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# chunk surgery helpers
# ---------------------------------------------------------------------------

def chunk(name: bytes, body: bytes, crc: int | None = None) -> bytes:
    if crc is None:
        crc = zlib.crc32(name + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + name + body + struct.pack(">I", crc)


def parse(png: bytes) -> list[tuple[bytes, bytes]]:
    """[(name, body)] of a well-formed PNG (raises on anything else)."""
    assert png[:8] == SIG
    out, pos = [], 8
    while pos < len(png):
        (n,) = struct.unpack(">I", png[pos:pos + 4])
        name = png[pos + 4:pos + 8]
        out.append((name, png[pos + 8:pos + 8 + n]))
        pos += 12 + n
    return out


def build(chunks: list[tuple[bytes, bytes]]) -> bytes:
    return SIG + b"".join(chunk(n, b) for n, b in chunks)


def make_ihdr(w: int, h: int, depth: int = 8, color: int = 2,
              comp: int = 0, filt: int = 0, interlace: int = 0) -> bytes:
    return struct.pack(">IIBBBBB", w, h, depth, color, comp, filt, interlace)


def raw_idat(w: int, h: int, channels: int, depth: int = 8,
             value: int = 0x40) -> bytes:
    """Valid zlib stream of all-`value` scanlines with filter 0."""
    rowbytes = (w * channels * depth + 7) // 8
    return zlib.compress((b"\x00" + bytes([value]) * rowbytes) * h, 9)


def base_rgb(w: int = 16, h: int = 12) -> bytes:
    """Deterministic small RGB PNG (gradient, filter 0 rows)."""
    rows = bytearray()
    for y in range(h):
        rows += b"\x00"
        for x in range(w):
            rows += bytes([(x * 16) & 0xFF, (y * 20) & 0xFF, (x * y) & 0xFF])
    return build([(b"IHDR", make_ihdr(w, h, 8, 2)),
                  (b"IDAT", zlib.compress(bytes(rows), 9)),
                  (b"IEND", b"")])


def base_gray(w: int = 16, h: int = 12) -> bytes:
    rows = bytearray()
    for y in range(h):
        rows += b"\x00" + bytes(((x * 7 + y * 13) & 0xFF) for x in range(w))
    return build([(b"IHDR", make_ihdr(w, h, 8, 0)),
                  (b"IDAT", zlib.compress(bytes(rows), 9)),
                  (b"IEND", b"")])


def base_palette(w: int = 16, h: int = 12, ncolors: int = 8,
                 max_index: int | None = None) -> bytes:
    """Palette PNG whose indices span [0, max_index]."""
    if max_index is None:
        max_index = ncolors - 1
    plte = bytes(b for i in range(ncolors) for b in (i * 30 & 0xFF, i * 50 & 0xFF, i * 70 & 0xFF))
    rows = bytearray()
    for y in range(h):
        rows += b"\x00" + bytes(((x + y) % (max_index + 1)) for x in range(w))
    return build([(b"IHDR", make_ihdr(w, h, 8, 3)),
                  (b"PLTE", plte),
                  (b"IDAT", zlib.compress(bytes(rows), 9)),
                  (b"IEND", b"")])


def with_chunk_at(png: bytes, idx: int, name: bytes, body: bytes) -> bytes:
    cs = parse(png)
    cs.insert(idx, (name, body))
    return build(cs)


def replace_chunk(png: bytes, name: bytes, body: bytes) -> bytes:
    cs = [(n, body if n == name else b) for n, b in parse(png)]
    return build(cs)


def drop_chunk(png: bytes, name: bytes) -> bytes:
    return build([(n, b) for n, b in parse(png) if n != name])


def corrupt_crc(png: bytes, name: bytes, which: int = 0) -> bytes:
    """Flip a CRC bit of the which'th chunk called `name`."""
    cs = parse(png)
    out = SIG
    seen = 0
    for n, b in cs:
        if n == name and seen == which:
            crc = (zlib.crc32(n + b) ^ 0x00010000) & 0xFFFFFFFF
            out += chunk(n, b, crc)
        else:
            out += chunk(n, b)
        if n == name:
            seen += 1
    return out


# ---------------------------------------------------------------------------
# deterministic malformed catalog
# ---------------------------------------------------------------------------

def catalog() -> list[tuple[str, bytes]]:
    """[(category_name, png_bytes)] — every known malformed class, one
    deterministic specimen each.  Used by the probe and as regression
    vectors in tests/test_malformed.py."""
    rgb = base_rgb()
    gray = base_gray()
    pal = base_palette()
    cases: list[tuple[str, bytes]] = []
    A = cases.append

    # --- signature / container structure ---
    A(("empty_file", b""))
    A(("sig_truncated", SIG[:4]))
    A(("sig_bad_byte", b"\x88" + SIG[1:] + rgb[8:]))
    A(("sig_only", SIG))
    A(("trunc_mid_chunk_header", rgb[: 8 + 4]))
    A(("trunc_mid_chunk_data", rgb[: 8 + 8 + 5]))
    A(("trunc_before_iend", build(parse(rgb)[:-1])))
    A(("garbage_after_iend", rgb + b"\xde\xad\xbe\xef" * 4))
    A(("chunk_len_beyond_eof",
       SIG + struct.pack(">I", 13) + b"IHDR" + make_ihdr(16, 12)[:6]))
    A(("chunk_len_huge",
       SIG + struct.pack(">I", 0xFFFFFFF0) + b"IHDR" + make_ihdr(16, 12)))

    # --- IHDR field abuse ---
    A(("ihdr_not_first", with_chunk_at(rgb, 0, b"tEXt", b"k\x00v")))
    A(("ihdr_missing", build(parse(rgb)[1:])))
    A(("ihdr_duplicate", with_chunk_at(rgb, 1, b"IHDR", make_ihdr(16, 12, 8, 2))))
    A(("ihdr_short", build([(b"IHDR", make_ihdr(16, 12)[:8])] + parse(rgb)[1:])))
    A(("ihdr_long",
       build([(b"IHDR", make_ihdr(16, 12) + b"\x00\x00")] + parse(rgb)[1:])))
    A(("width_zero", replace_chunk(rgb, b"IHDR", make_ihdr(0, 12))))
    A(("height_zero", replace_chunk(rgb, b"IHDR", make_ihdr(16, 0))))
    A(("width_2g", replace_chunk(rgb, b"IHDR", make_ihdr(0x80000001, 12))))
    A(("width_over_user_limit",
       replace_chunk(rgb, b"IHDR", make_ihdr(1000001, 12))))
    A(("dims_bomb_100k",  # the round-3 verdict SIGABRT repro (91-byte class)
       build([(b"IHDR", make_ihdr(100000, 100000, 8, 6)),
              (b"IDAT", zlib.compress(b"\x00" * 64, 9)),
              (b"IEND", b"")])))
    A(("dims_bomb_1m_wide",
       build([(b"IHDR", make_ihdr(1000000, 1000000, 8, 6)),
              (b"IDAT", zlib.compress(b"\x00" * 64, 9)),
              (b"IEND", b"")])))
    A(("bit_depth_3", replace_chunk(rgb, b"IHDR", make_ihdr(16, 12, 3, 2))))
    A(("bit_depth_2_rgb", replace_chunk(rgb, b"IHDR", make_ihdr(16, 12, 2, 2))))
    A(("bit_depth_16_palette",
       replace_chunk(pal, b"IHDR", make_ihdr(16, 12, 16, 3))))
    A(("color_type_5", replace_chunk(rgb, b"IHDR", make_ihdr(16, 12, 8, 5))))
    A(("color_type_7", replace_chunk(rgb, b"IHDR", make_ihdr(16, 12, 8, 7))))
    A(("compression_method_1",
       replace_chunk(rgb, b"IHDR", make_ihdr(16, 12, 8, 2, comp=1))))
    A(("filter_method_1",
       replace_chunk(rgb, b"IHDR", make_ihdr(16, 12, 8, 2, filt=1))))
    A(("interlace_2",
       replace_chunk(rgb, b"IHDR", make_ihdr(16, 12, 8, 2, interlace=2))))

    # --- kept-chunk ordering (round-4 fuzz repro, seed 97185) ---
    A(("two_kept_chunks_before_idat",
       with_chunk_at(with_chunk_at(rgb, 1, b"aaAa", b"first"),
                     2, b"bbBb", b"second")))

    # --- header-time dispatch ordering (round-4 review repros): libpng
    # acts on a chunk's length+name BEFORE reading its data or CRC ---
    rgb_idat = next(b for nm, b in parse(rgb) if nm == b"IDAT")
    A(("idat_run_split_by_bad_crc_gama",
       # png_read_row ends the IDAT run at the gAMA HEADER (its bad CRC is
       # never reached) -> "Not enough image data", NOT a bridged decode
       SIG + chunk(b"IHDR", make_ihdr(16, 12, 8, 2))
       + chunk(b"IDAT", rgb_idat[:len(rgb_idat) // 2])
       + chunk(b"gAMA", struct.pack(">I", 45455), crc=0xDEAD)
       + chunk(b"IDAT", rgb_idat[len(rgb_idat) // 2:])
       + chunk(b"IEND", b"")))
    A(("text_empty_bad_crc_before_idat",
       # under --strip the tEXt handler's zero-length read-past-EOF
       # bug-compat fires while reading data, BEFORE the CRC check
       SIG + chunk(b"IHDR", make_ihdr(16, 12, 8, 2))
       + chunk(b"tEXt", b"", crc=1)
       + chunk(b"IDAT", rgb_idat) + chunk(b"IEND", b"")))
    A(("dims_bomb_bad_idat_crc",
       # the rwpng.c:287-290 guard fires at the first IDAT *header*
       # (exit 24) before the IDAT CRC is ever verified
       SIG + chunk(b"IHDR", make_ihdr(100000, 100000, 8, 6))
       + chunk(b"IDAT", b"xx", crc=5) + chunk(b"IEND", b"")))

    # --- PLTE ---
    A(("plte_len_not_mult3", replace_chunk(pal, b"PLTE", b"\x01\x02\x03\x04")))
    A(("plte_missing_for_palette", drop_chunk(pal, b"PLTE")))
    A(("plte_duplicate", with_chunk_at(pal, 2, b"PLTE", b"\x10\x20\x30")))
    A(("plte_after_idat",
       build([parse(pal)[0], parse(pal)[2], parse(pal)[1], parse(pal)[3]])))
    A(("plte_in_gray", with_chunk_at(gray, 1, b"PLTE", b"\x10\x20\x30")))
    A(("plte_empty", replace_chunk(pal, b"PLTE", b"")))
    A(("plte_empty_truecolor",  # round-4 fuzz repro (seed 97193): a zero-
       # length PLTE passes the handler's length check and is fatal in
       # png_set_PLTE ("Invalid palette"), even for non-palette color types
       with_chunk_at(rgb, 1, b"PLTE", b"")))
    A(("plte_257_entries", replace_chunk(pal, b"PLTE", bytes(257 * 3))))
    # libpng sets the PNG_HAVE_PLTE mode bit BEFORE the grayscale/length
    # checks, so even an ignored PLTE flips kept-chunk locations to 2 and
    # arms the duplicate check (round-4 fuzz repro seed 33487 + oracle
    # probes; png_handle_PLTE / pngset.c check_location)
    A(("text_straddles_plte",  # kept chunk before AND after PLTE: the
       # location-1 group is written before the location-2 group, so the
       # emitted order is NOT simply reversed read order
       with_chunk_at(with_chunk_at(pal, 1, b"tEXt", b"ka\x00AAAA"),
                     3, b"tEXt", b"kb\x00BBBB")))
    A(("gama_after_ignored_gray_plte",  # mode bit from the ignored PLTE
       # makes the gAMA "out of place" — gamma must stay default
       with_chunk_at(with_chunk_at(gray, 1, b"PLTE", bytes(9)),
                     2, b"gAMA", struct.pack(">I", 25000))))
    A(("plte_duplicate_after_ignored",  # gray PLTE(0) is benign but arms
       # the duplicate check: second PLTE is fatal
       with_chunk_at(with_chunk_at(gray, 1, b"PLTE", b""),
                     2, b"PLTE", bytes(9))))
    A(("text_straddles_benign_rgb_plte",  # bad-length PLTE in RGB is a
       # benign discard but still splits the kept-chunk location groups
       with_chunk_at(with_chunk_at(with_chunk_at(rgb,
                     1, b"tEXt", b"ka\x00AAAA"),
                     2, b"PLTE", bytes(4)),
                     3, b"tEXt", b"kb\x00BBBB")))
    A(("srgb_after_suggested_plte",  # suggested palette in RGB: sRGB after
       # it is out of place and ignored
       with_chunk_at(with_chunk_at(rgb, 1, b"PLTE", bytes(9)),
                     2, b"sRGB", b"\x00")))
    A(("palette_index_oob",
       # indices reach 7 but only 4 palette entries are present
       replace_chunk(base_palette(ncolors=8, max_index=7), b"PLTE",
                     bytes(b for i in range(4)
                           for b in (i * 30, i * 50, i * 70)))))

    # --- tRNS ---
    A(("trns_longer_than_palette",  # the round-3 verdict parity-divergence repro
       with_chunk_at(pal, 2, b"tRNS", bytes(range(16)))))
    A(("trns_equal_palette", with_chunk_at(pal, 2, b"tRNS", bytes(range(8)))))
    A(("trns_short_ok", with_chunk_at(pal, 2, b"tRNS", bytes([7, 200]))))
    A(("trns_gray_len1", with_chunk_at(gray, 1, b"tRNS", b"\x07")))
    A(("trns_gray_len4", with_chunk_at(gray, 1, b"tRNS", b"\x00\x07\x00\x08")))
    A(("trns_gray_ok", with_chunk_at(gray, 1, b"tRNS", b"\x00\x07")))
    A(("trns_rgb_len5", with_chunk_at(rgb, 1, b"tRNS", bytes(5))))
    A(("trns_rgb_ok", with_chunk_at(rgb, 1, b"tRNS", bytes(6))))
    A(("trns_on_rgba",
       build([(b"IHDR", make_ihdr(4, 4, 8, 6)), (b"tRNS", bytes(6)),
              (b"IDAT", raw_idat(4, 4, 4)), (b"IEND", b"")])))
    A(("trns_on_gray_alpha",
       build([(b"IHDR", make_ihdr(4, 4, 8, 4)), (b"tRNS", b"\x00\x07"),
              (b"IDAT", raw_idat(4, 4, 2)), (b"IEND", b"")])))
    A(("trns_before_plte",
       build([parse(pal)[0], (b"tRNS", bytes([5, 6])), parse(pal)[1],
              parse(pal)[2], parse(pal)[3]])))
    A(("trns_after_idat", with_chunk_at(pal, 3, b"tRNS", bytes([5, 6]))))
    A(("trns_empty_palette", with_chunk_at(pal, 2, b"tRNS", b"")))

    # --- IDAT / image data ---
    A(("idat_bitflip_body", (lambda c: build(
        [(n, (bytes([b[0] ^ 0x80]) + b[1:]) if n == b"IDAT" else b)
         for n, b in c]))(parse(rgb))))
    A(("idat_crc_bad", corrupt_crc(rgb, b"IDAT")))
    A(("ihdr_crc_bad", corrupt_crc(rgb, b"IHDR")))
    A(("idat_truncated_stream", (lambda c: build(
        [(n, b[:-6] if n == b"IDAT" else b) for n, b in c]))(parse(rgb))))
    A(("idat_short_rows",  # valid zlib, too few scanlines
       replace_chunk(rgb, b"IDAT",
                     zlib.compress((b"\x00" + b"\x40" * 48) * 6, 9))))
    A(("idat_extra_rows",  # valid zlib, extra full scanlines beyond height
       replace_chunk(rgb, b"IDAT",
                     zlib.compress((b"\x00" + b"\x40" * 48) * 20, 9))))
    A(("idat_trailing_garbage_in_zlib",  # stream ends, then junk bytes
       replace_chunk(rgb, b"IDAT",
                     zlib.compress((b"\x00" + b"\x40" * 48) * 12, 9) + b"junk")))
    A(("idat_missing", drop_chunk(rgb, b"IDAT")))
    A(("idat_split_by_text",  # non-consecutive IDATs
       (lambda c: build([c[0], (b"IDAT", b""), (b"tEXt", b"k\x00v"),
                         c[1], c[2]]))(parse(rgb))))
    A(("idat_bad_zlib_header", (lambda c: build(
        [(n, b"\xff\xff" + b[2:] if n == b"IDAT" else b)
         for n, b in c]))(parse(rgb))))
    A(("scanline_filter_5",
       replace_chunk(rgb, b"IDAT",
                     zlib.compress((b"\x05" + b"\x40" * 48)
                                   + (b"\x00" + b"\x40" * 48) * 11, 9))))
    A(("scanline_filter_255",
       replace_chunk(rgb, b"IDAT",
                     zlib.compress((b"\x00" + b"\x40" * 48) * 11
                                   + (b"\xff" + b"\x40" * 48), 9))))

    # --- ancillary / unknown chunks ---
    A(("ancillary_crc_bad",
       corrupt_crc(with_chunk_at(rgb, 1, b"tEXt", b"k\x00v"), b"tEXt")))
    A(("gama_len_0", with_chunk_at(rgb, 1, b"gAMA", b"")))
    A(("gama_len_2", with_chunk_at(rgb, 1, b"gAMA", b"\x00\x01")))
    A(("gama_zero", with_chunk_at(rgb, 1, b"gAMA", struct.pack(">I", 0))))
    A(("gama_huge", with_chunk_at(rgb, 1, b"gAMA", struct.pack(">I", 10**9))))
    A(("srgb_len_0", with_chunk_at(rgb, 1, b"sRGB", b"")))
    A(("srgb_len_2", with_chunk_at(rgb, 1, b"sRGB", b"\x00\x01")))
    A(("srgb_bad_intent", with_chunk_at(rgb, 1, b"sRGB", b"\x09")))
    A(("unknown_critical", with_chunk_at(rgb, 1, b"ABCD", b"xyzw")))
    A(("unknown_ancillary_unsafe", with_chunk_at(rgb, 1, b"aBCD", b"xyzw")))
    A(("unknown_ancillary_safe", with_chunk_at(rgb, 1, b"aBCd", b"xyzw")))
    A(("chunk_after_iend", rgb + chunk(b"tEXt", b"k\x00v")))
    A(("text_empty", with_chunk_at(rgb, 1, b"tEXt", b"")))
    A(("phys_len_bad", with_chunk_at(rgb, 1, b"pHYs", b"\x00\x01")))

    # --- chunk-before-IHDR rules (which handlers require IHDR first?) ---
    A(("gama_before_ihdr",
       with_chunk_at(rgb, 0, b"gAMA", struct.pack(">I", 45455))))
    A(("trns_before_ihdr", with_chunk_at(rgb, 0, b"tRNS", bytes(6))))
    A(("plte_before_ihdr", with_chunk_at(pal, 0, b"PLTE", b"\x01\x02\x03")))
    A(("idat_before_ihdr", with_chunk_at(rgb, 0, b"IDAT", b"")))
    A(("iend_first", build([(b"IEND", b"")] + parse(rgb))))
    A(("unknown_before_ihdr", with_chunk_at(rgb, 0, b"aBCd", b"xy")))

    # --- IDAT run semantics ---
    A(("idat_complete_then_text_then_idat",
       (lambda c: build([c[0], c[1], (b"tEXt", b"k\x00v"),
                         (b"IDAT", b"xx"), c[2]]))(parse(rgb))))
    A(("idat_complete_then_empty_idat",
       (lambda c: build([c[0], c[1], (b"IDAT", b""), c[2]]))(parse(rgb))))
    A(("idat_complete_then_garbage_idat",
       (lambda c: build([c[0], c[1], (b"IDAT", b"\x01\x02\x03"),
                         c[2]]))(parse(rgb))))

    # --- known-ancillary handler validity rules ---
    A(("bkgd_bad_len", with_chunk_at(gray, 1, b"bKGD", bytes(5))))
    A(("bkgd_before_plte", with_chunk_at(pal, 1, b"bKGD", b"\x01")))
    A(("bkgd_rgb_ok", with_chunk_at(rgb, 1, b"bKGD", bytes(6))))
    A(("hist_without_plte", with_chunk_at(rgb, 1, b"hIST", bytes(4))))
    A(("hist_wrong_len", with_chunk_at(pal, 2, b"hIST", bytes(6))))
    A(("time_bad_len", with_chunk_at(rgb, 1, b"tIME", bytes(3))))
    A(("sbit_bad_len", with_chunk_at(rgb, 1, b"sBIT", bytes(5))))
    A(("sbit_zero_depth", with_chunk_at(rgb, 1, b"sBIT", bytes(3))))
    A(("chrm_bad_len", with_chunk_at(rgb, 1, b"cHRM", bytes(7))))
    A(("iccp_garbage", with_chunk_at(rgb, 1, b"iCCP", b"nm\x00\x00junk")))
    A(("splt_garbage", with_chunk_at(rgb, 1, b"sPLT", b"\x00\x07xy")))
    A(("text_no_nul", with_chunk_at(rgb, 1, b"tEXt", b"nonulhere")))
    A(("ztxt_bad_method", with_chunk_at(rgb, 1, b"zTXt", b"k\x00\x07zz")))

    # --- chunk ordering / duplication of known ancillaries ---
    A(("gama_after_plte", with_chunk_at(pal, 2, b"gAMA",
                                        struct.pack(">I", 45455))))
    A(("gama_after_idat", with_chunk_at(rgb, 2, b"gAMA",
                                        struct.pack(">I", 45455))))
    A(("srgb_after_idat", with_chunk_at(rgb, 2, b"sRGB", b"\x00")))
    A(("gama_duplicate",
       with_chunk_at(with_chunk_at(rgb, 1, b"gAMA", struct.pack(">I", 45455)),
                     1, b"gAMA", struct.pack(">I", 30000))))
    A(("srgb_duplicate",
       with_chunk_at(with_chunk_at(rgb, 1, b"sRGB", b"\x00"),
                     1, b"sRGB", b"\x01")))
    A(("srgb_then_gama",
       with_chunk_at(with_chunk_at(rgb, 1, b"sRGB", b"\x00"),
                     2, b"gAMA", struct.pack(">I", 30000))))
    A(("gama_then_srgb",
       with_chunk_at(with_chunk_at(rgb, 1, b"gAMA", struct.pack(">I", 30000)),
                     2, b"sRGB", b"\x00")))
    A(("trns_duplicate",
       with_chunk_at(with_chunk_at(pal, 2, b"tRNS", bytes([10, 20])),
                     3, b"tRNS", bytes([99]))))

    return cases


# ---------------------------------------------------------------------------
# random mutation fuzzing
# ---------------------------------------------------------------------------

def random_base(rng: np.random.Generator) -> bytes:
    """A random small VALID PNG covering all color layouts (built by hand so
    this module stays importable without the repo codec)."""
    w = int(rng.integers(1, 24))
    h = int(rng.integers(1, 24))
    kind = int(rng.integers(0, 4))
    if kind == 0:
        return base_rgb(w, h)
    if kind == 1:
        return base_gray(w, h)
    if kind == 2:
        nc = int(rng.integers(1, 17))
        png = base_palette(w, h, ncolors=nc)
        if rng.random() < 0.5:
            png = with_chunk_at(png, 2, b"tRNS",
                                bytes(rng.integers(0, 256, size=int(rng.integers(0, nc + 1)), dtype=np.uint8)))
        return png
    rows = bytearray()
    for y in range(h):
        rows += b"\x00" + bytes(rng.integers(0, 256, size=w * 4, dtype=np.uint8))
    return build([(b"IHDR", make_ihdr(w, h, 8, 6)),
                  (b"IDAT", zlib.compress(bytes(rows), 9)),
                  (b"IEND", b"")])


def mutate(png: bytes, rng: np.random.Generator) -> tuple[str, bytes]:
    """One random structural or byte-level mutation of a PNG.  Structural
    mutations need a parseable container; once an earlier mutation broke
    that, fall back to byte-level mutation."""
    try:
        return _mutate(png, rng)
    except Exception:
        data = bytearray(png) or bytearray(b"\x00")
        i = int(rng.integers(0, len(data)))
        data[i] ^= 1 << int(rng.integers(0, 8))
        return "bitflip", bytes(data)


def _mutate(png: bytes, rng: np.random.Generator) -> tuple[str, bytes]:
    kind = rng.choice([
        "bitflip", "truncate", "len_lie", "crc_flip", "dup_chunk",
        "drop_chunk", "insert_chunk", "swap_chunks", "ihdr_field",
        "trns_inject", "idat_resize", "zlib_corrupt",
    ])
    data = bytearray(png)
    if kind == "bitflip":
        i = int(rng.integers(0, len(data)))
        data[i] ^= 1 << int(rng.integers(0, 8))
        return kind, bytes(data)
    if kind == "truncate":
        return kind, bytes(data[: int(rng.integers(0, len(data)))])
    cs = parse(png)
    if kind == "len_lie":
        # rewrite one chunk's length field without moving its bytes
        out, pick = SIG, int(rng.integers(0, len(cs)))
        for i, (n, b) in enumerate(cs):
            if i == pick:
                lie = int(rng.integers(0, 2 * len(b) + 16))
                out += struct.pack(">I", lie) + n + b + struct.pack(
                    ">I", zlib.crc32(n + b) & 0xFFFFFFFF)
            else:
                out += chunk(n, b)
        return kind, out
    if kind == "crc_flip":
        n = cs[int(rng.integers(0, len(cs)))][0]
        return kind, corrupt_crc(png, n)
    if kind == "dup_chunk":
        i = int(rng.integers(0, len(cs)))
        cs.insert(i, cs[int(rng.integers(0, len(cs)))])
        return kind, build(cs)
    if kind == "drop_chunk":
        del cs[int(rng.integers(0, len(cs)))]
        return kind, build(cs)
    if kind == "insert_chunk":
        names = [b"tEXt", b"tRNS", b"PLTE", b"gAMA", b"sRGB", b"pHYs",
                 b"ABCD", b"aBCd", b"IDAT", b"IHDR"]
        name = names[int(rng.integers(0, len(names)))]
        body = bytes(rng.integers(0, 256, size=int(rng.integers(0, 24)),
                                  dtype=np.uint8))
        cs.insert(int(rng.integers(0, len(cs) + 1)), (name, body))
        return kind, build(cs)
    if kind == "swap_chunks":
        if len(cs) >= 2:
            i = int(rng.integers(0, len(cs) - 1))
            cs[i], cs[i + 1] = cs[i + 1], cs[i]
        return kind, build(cs)
    if kind == "ihdr_field":
        ih = bytearray(cs[0][1] if cs and cs[0][0] == b"IHDR" else make_ihdr(4, 4))
        if len(ih) >= 13:
            field = int(rng.integers(0, 6))
            if field == 0:
                ih[0:4] = struct.pack(">I", int(rng.choice(
                    [0, 1, 0x7FFFFFFF, 0x80000000, 1000001, 100000])))
            elif field == 1:
                ih[4:8] = struct.pack(">I", int(rng.choice(
                    [0, 1, 0x7FFFFFFF, 0x80000000, 1000001, 100000])))
            else:
                ih[7 + field] = int(rng.integers(0, 17))
        cs2 = [(n, bytes(ih) if n == b"IHDR" else b) for n, b in cs]
        return kind, build(cs2)
    if kind == "trns_inject":
        body = bytes(rng.integers(0, 256, size=int(rng.integers(0, 20)),
                                  dtype=np.uint8))
        cs.insert(int(rng.integers(1, max(len(cs), 2))), (b"tRNS", body))
        return kind, build(cs)
    if kind == "idat_resize":
        # re-deflate with a random number of scanlines of random length
        nrows = int(rng.integers(0, 40))
        rb = int(rng.integers(0, 80))
        filt = int(rng.choice([0, 0, 0, 1, 2, 3, 4, 5, 9]))
        stream = zlib.compress(
            (bytes([filt]) + bytes(rng.integers(0, 256, size=rb,
                                                dtype=np.uint8))) * nrows, 9)
        cs2 = [(n, stream if n == b"IDAT" else b) for n, b in cs]
        return kind, build(cs2)
    # zlib_corrupt
    out = SIG
    for n, b in cs:
        if n == b"IDAT" and len(b) > 2:
            b = bytearray(b)
            b[int(rng.integers(0, len(b)))] ^= 0xFF
            b = bytes(b)
        out += chunk(n, b)
    return kind, out
