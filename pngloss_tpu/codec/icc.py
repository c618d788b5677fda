"""Optional ICC -> sRGB read transform (rwpng.c:309-392, `#if USE_LCMS`).

The reference can be compiled against Little CMS; in that build it
transforms input pixels to sRGB when the PNG carries

  * an embedded iCCP profile in the RGB colorspace on a color image
    (rwpng.c:323-341), or
  * gAMA + cHRM chunks (and no sRGB chunk) on a color image, from which
    it synthesizes an RGB matrix profile (rwpng.c:343-369),

then tags the output sRGB and sets gamma to 0.45455 (rwpng.c:371-392).
A GRAY profile on a gray image is ignored with a warning but still tags
the output sRGB (rwpng.c:333-336).

This module reproduces that behavior in pure numpy, gated by
``PNGLOSS_ICC=1`` (the reference's default build has USE_LCMS off, and
byte parity with the default build requires the transform stay off).
Scope: matrix-shaper profiles (rXYZ/gXYZ/bXYZ + rTRC/gTRC/bTRC with
'curv'/'para' curves) — the kind every PNG-embedded display profile is.
LUT-based (A2B0) profiles are skipped with a warning; Little CMS's exact
integer rounding is not byte-anchored (the transform is float, rounded
once at the end), since no default-build oracle exists to anchor to.
"""

from __future__ import annotations

import struct
import sys
import zlib

import numpy as np

# verbose notes, printed by the CLI exactly as pngloss.c:241-249 does
NOTE_ICCP = "iccp"
NOTE_GAMA_CHRM = "gama_chrm"
NOTE_ICCP_WARN_GRAY = "iccp_warn_gray"

_D50 = np.array([0.9642, 1.0, 0.8249])
_BRADFORD = np.array([
    [0.8951, 0.2664, -0.1614],
    [-0.7502, 1.7135, 0.0367],
    [0.0389, -0.0685, 1.0296],
])


def enabled() -> bool:
    import os

    return os.environ.get("PNGLOSS_ICC", "0") == "1"


# ---------------------------------------------------------------- chunks


def scan_color_chunks(data: bytes) -> dict:
    """Pull IHDR color type + iCCP/sRGB/gAMA/cHRM out of raw PNG bytes
    (pre-IDAT by spec). Returns {} if the stream is not a PNG."""
    out: dict = {"color_type": None, "iccp": None, "srgb": False,
                 "gamma": None, "chrm": None}
    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return out
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        name = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            break
        if name == b"IHDR" and length >= 13:
            out["color_type"] = body[9]
        elif name == b"iCCP":
            # name\0 compression-method, then zlib profile
            z = body.find(b"\x00")
            if 0 <= z and z + 2 <= len(body):
                try:
                    out["iccp"] = zlib.decompress(body[z + 2:])
                except zlib.error:
                    pass
        elif name == b"sRGB":
            out["srgb"] = True
        elif name == b"gAMA" and length == 4:
            (g,) = struct.unpack(">I", body)
            if g:
                out["gamma"] = g / 100000.0
        elif name == b"cHRM" and length == 32:
            vals = struct.unpack(">8I", body)
            out["chrm"] = tuple(v / 100000.0 for v in vals)
        elif name in (b"IDAT", b"IEND"):
            break
        pos += 12 + length
    return out


# ---------------------------------------------------------- ICC parsing


def _s15f16(b: bytes, off: int) -> float:
    (v,) = struct.unpack(">i", b[off:off + 4])
    return v / 65536.0


def _parse_curve(tag: bytes):
    """'curv'/'para' tag -> linearization f: [0,1] -> [0,1] (vectorized)."""
    sig = tag[:4]
    if sig == b"curv":
        (count,) = struct.unpack(">I", tag[8:12])
        if count == 0:
            return lambda x: x
        if len(tag) < 12 + 2 * count:
            return None   # truncated table: unusable curve, skip transform
        if count == 1:
            (g,) = struct.unpack(">H", tag[12:14])
            gamma = g / 256.0
            return lambda x: np.power(x, gamma)
        lut = np.frombuffer(tag[12:12 + 2 * count], dtype=">u2").astype(
            np.float64) / 65535.0
        xs = np.linspace(0.0, 1.0, count)
        return lambda x: np.interp(x, xs, lut)
    if sig == b"para":
        (ftype,) = struct.unpack(">H", tag[8:10])
        # Types 0-4 carry 1/3/4/5/7 params; real profiles are sized to
        # exactly that, so read only what is present (ICC.1 table 68).
        navail = max(0, min(7, (len(tag) - 12) // 4))
        nneed = {0: 1, 1: 3, 2: 4, 3: 5, 4: 7}.get(ftype)
        if nneed is None or navail < nneed:
            return None
        p = [_s15f16(tag, 12 + 4 * i) for i in range(navail)]
        g, a, b, c, d, e, f = (p + [0.0] * 7)[:7]
        if ftype in (1, 2) and a == 0.0:
            return None   # breakpoint -b/a undefined: unusable curve

        def _pw(base, g=g):
            # clamp: a malformed profile can select a negative power base
            # (a*d+b < 0) whose NaN would otherwise reach the pixel cast
            return np.power(np.maximum(base, 0.0), g)

        if ftype == 0:
            return lambda x: _pw(x)
        if ftype == 1:
            return lambda x: np.where(x >= -b / a, _pw(a * x + b), 0.0)
        if ftype == 2:
            return lambda x: np.where(x >= -b / a, _pw(a * x + b) + c, c)
        if ftype == 3:
            return lambda x: np.where(x >= d, _pw(a * x + b), c * x)
        if ftype == 4:
            return lambda x: np.where(x >= d, _pw(a * x + b) + e, c * x + f)
    return None


def parse_matrix_shaper(profile: bytes):
    """(M 3x3 RGB->XYZ(D50), [fr, fg, fb] linearization curves) or None.

    Also returns None for LUT-based profiles (no rXYZ) — callers warn."""
    if len(profile) < 132:
        return None
    (count,) = struct.unpack(">I", profile[128:132])
    tags = {}
    for i in range(count):
        off = 132 + 12 * i
        if off + 12 > len(profile):
            return None
        sig = profile[off:off + 4]
        o, sz = struct.unpack(">II", profile[off + 4:off + 12])
        if o + sz > len(profile):
            return None
        tags[sig] = profile[o:o + sz]
    need = (b"rXYZ", b"gXYZ", b"bXYZ", b"rTRC", b"gTRC", b"bTRC")
    if any(t not in tags for t in need):
        return None
    cols = []
    for t in (b"rXYZ", b"gXYZ", b"bXYZ"):
        body = tags[t]
        if body[:4] != b"XYZ " or len(body) < 20:
            return None
        cols.append([_s15f16(body, 8), _s15f16(body, 12), _s15f16(body, 16)])
    m = np.array(cols).T                      # columns = r/g/b XYZ
    curves = []
    for t in (b"rTRC", b"gTRC", b"bTRC"):
        f = _parse_curve(tags[t])
        if f is None:
            return None
        curves.append(f)
    return m, curves


def profile_colorspace(profile: bytes) -> bytes:
    return profile[16:20] if len(profile) >= 20 else b""


# ----------------------------------------------------------- colorimetry


def _xy_to_xyz(x: float, y: float) -> np.ndarray:
    return np.array([x / y, 1.0, (1.0 - x - y) / y])


def _bradford_adapt(src_white: np.ndarray, dst_white: np.ndarray) -> np.ndarray:
    cs = _BRADFORD @ src_white
    cd = _BRADFORD @ dst_white
    return np.linalg.inv(_BRADFORD) @ np.diag(cd / cs) @ _BRADFORD


def rgb_matrix_from_chrm(chrm, dst_white: np.ndarray = _D50) -> np.ndarray:
    """RGB->XYZ(dst_white) matrix from cHRM primaries + white point, the
    way cmsCreateRGBProfile builds matrix profiles (white-scaled columns,
    Bradford-adapted into the PCS)."""
    wx, wy, rx, ry, gx, gy, bx, by = chrm
    prim = np.stack([_xy_to_xyz(rx, ry), _xy_to_xyz(gx, gy),
                     _xy_to_xyz(bx, by)], axis=1)
    white = _xy_to_xyz(wx, wy)
    scale = np.linalg.solve(prim, white)
    m = prim * scale[None, :]
    return _bradford_adapt(white, dst_white) @ m


_SRGB_CHRM = (0.3127, 0.3290, 0.64, 0.33, 0.30, 0.60, 0.15, 0.06)
_M_SRGB_D50 = rgb_matrix_from_chrm(_SRGB_CHRM)          # sRGB -> XYZ(D50)
_M_D50_SRGB = np.linalg.inv(_M_SRGB_D50)                # XYZ(D50) -> sRGB


def _srgb_encode(lin: np.ndarray) -> np.ndarray:
    lin = np.clip(lin, 0.0, 1.0)
    return np.where(lin <= 0.0031308,
                    12.92 * lin,
                    1.055 * np.power(lin, 1.0 / 2.4) - 0.055)


def transform_rgba(rgba: np.ndarray, m_in: np.ndarray, curves) -> np.ndarray:
    """Relative-colorimetric matrix transform of (H, W, 4) uint8 RGBA to
    sRGB (alpha untouched). LCMS's perceptual intent degrades to this for
    matrix-shaper profiles (no gamut mapping tables to apply)."""
    h, w = rgba.shape[:2]
    out = rgba.copy()
    rgb = rgba[:, :, :3].astype(np.float64) / 255.0
    lin = np.empty_like(rgb)
    for c in range(3):
        # 256-entry LUT: exact for 8-bit inputs, one curve eval per level
        lut = np.clip(curves[c](np.linspace(0.0, 1.0, 256)), 0.0, 1.0)
        lin[:, :, c] = lut[rgba[:, :, c]]
    xyz = lin.reshape(-1, 3) @ m_in.T
    srgb_lin = xyz @ _M_D50_SRGB.T
    enc = _srgb_encode(srgb_lin).reshape(h, w, 3)
    out[:, :, :3] = np.clip(np.rint(enc * 255.0), 0, 255).astype(np.uint8)
    return out


# ------------------------------------------------------------ entry point


def apply(data: bytes, img) -> str | None:
    """rwpng.c:309-392 decision tree. Mutates img (rgba / gamma /
    color_transform) in place; returns the verbose-note id or None."""
    from pngloss_tpu.codec import pypng

    info = scan_color_chunks(data)
    ct = info["color_type"]
    if ct is None:
        return None
    color_png = bool(ct & 2)                  # PNG_COLOR_MASK_COLOR

    profile = info["iccp"]
    m_curves = None
    note = None
    if profile is not None:
        cs = profile_colorspace(profile)
        if cs == b"RGB " and color_png:
            parsed = parse_matrix_shaper(profile)
            if parsed is None:
                print("pngloss-tpu: iCCP profile is not matrix-shaper; "
                      "skipping ICC transform", file=sys.stderr)
                return None     # lcms would transform; we cannot — bail
            m_curves = parsed
            note = NOTE_ICCP
        elif cs == b"GRAY" and not color_png:
            # ignored with a warning, but the output is tagged sRGB
            # (rwpng.c:333-336)
            img.color_transform = pypng.COLOR_SRGB
            return NOTE_ICCP_WARN_GRAY

    if (m_curves is None and note is None and color_png
            and not info["srgb"] and info["gamma"] is not None
            and info["chrm"] is not None):
        gamma = info["gamma"]
        m = rgb_matrix_from_chrm(info["chrm"])
        g = 1.0 / gamma
        curves = [lambda x, g=g: np.power(x, g)] * 3
        m_curves = (m, curves)
        note = NOTE_GAMA_CHRM

    if m_curves is None:
        return None
    m, curves = m_curves
    img.rgba = transform_rgba(img.rgba, m, curves)
    img.gamma = 0.45455
    img.color_transform = pypng.COLOR_SRGB
    return note
