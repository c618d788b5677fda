"""Image-level pipeline: decode → colorspace-reduce → device optimize → encode.

This is the TPU-native replacement for the reference's L3/L4 orchestration
(pngloss_image.c + the per-file loop in pngloss.c): instead of one image at a
time, images are bucketed by working shape (H, W, bpp), batched per bucket,
and dispatched to the device with the batch axis sharded over the mesh.
Host-side PNG decode/DEFLATE overlaps device compute via a thread pool.
"""

from __future__ import annotations

import concurrent.futures as _futures
import dataclasses

import numpy as np

from pngloss_tpu import codec, tracing
from pngloss_tpu.codec import DecodedImage
from pngloss_tpu.ops import optimize_batch_auto
from pngloss_tpu.parallel import optimize_batch_sharded


def reduce_colorspace(rgba: np.ndarray) -> tuple[np.ndarray, int]:
    """Repack RGBA into the 1/2/3/4-byte working format
    (optimize_with_rows, pngloss_image.c:64-121; grayscale keeps the green
    channel). Returns ((H, W*bpp) uint8, bpp)."""
    grayscale, strip_alpha = codec.detect_colorspace(rgba)
    h, w = rgba.shape[0], rgba.shape[1]
    if grayscale and strip_alpha:
        work, bpp = rgba[:, :, 1:2], 1
    elif grayscale:
        work, bpp = rgba[:, :, (1, 3)], 2
    elif strip_alpha:
        work, bpp = rgba[:, :, :3], 3
    else:
        work, bpp = rgba, 4
    return np.ascontiguousarray(work).reshape(h, w * bpp), bpp


def restore_colorspace(work: np.ndarray, bpp: int, w: int) -> np.ndarray:
    """Working format back to RGBA (pngloss_image.c:126-147)."""
    h = work.shape[0]
    px = work.reshape(h, w, bpp)
    out = np.empty((h, w, 4), dtype=np.uint8)
    if bpp == 1:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = px[:, :, 0]
        out[:, :, 3] = 255
    elif bpp == 2:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = px[:, :, 0]
        out[:, :, 3] = px[:, :, 1]
    elif bpp == 3:
        out[:, :, :3] = px
        out[:, :, 3] = 255
    else:
        out[:] = px
    return out


def optimize_rgba(rgba: np.ndarray, strength: int = 19, bleed: int = 2,
                  use_row_filters: bool = True,
                  mesh=None) -> tuple[np.ndarray, np.ndarray]:
    """Optimize one RGBA image on device; the single-image counterpart of
    the reference's optimize_with_rows (pngloss_image.c:52).
    Returns (quantized RGBA (H,W,4) uint8, row_filters (H,) int8)."""
    q, f = optimize_rgba_batch([rgba], strength, bleed,
                               use_row_filters=use_row_filters, mesh=mesh)
    return q[0], f[0]


def unique_symbol_count(q_rgba: np.ndarray, row_filters: np.ndarray) -> int:
    """Number of distinct residual symbols the optimizer emitted
    (the reference's verbose 'used N unique symbols', pngloss_image.c:315-325).
    Recomputed from the quantized image: the emitted byte equals the
    recomputed residual byte under each row's winning filter."""
    work, bpp = reduce_colorspace(q_rgba)
    h, wb = work.shape
    rows = work.astype(np.int32)
    seen = np.zeros(256, bool)
    prev = np.zeros(wb, np.int32)
    for y in range(h):
        cur = rows[y]
        left = np.zeros(wb, np.int32)
        left[bpp:] = cur[:-bpp]
        diag = np.zeros(wb, np.int32)
        diag[bpp:] = prev[:-bpp]
        f = int(row_filters[y])
        if f == 0:
            pred = np.zeros(wb, np.int32)
        elif f == 1:
            pred = left
        elif f == 2:
            pred = prev
        elif f == 3:
            pred = (left + prev) // 2
        else:
            p = prev - diag
            pd = left - diag
            pred = np.where((np.abs(p) <= np.abs(pd)) & (np.abs(p) <= np.abs(p + pd)),
                            left, np.where(np.abs(pd) <= np.abs(p + pd), prev, diag))
        seen[(cur - pred) & 0xFF] = True
        prev = cur
    return int(seen.sum())


def optimize_for_average_filter(rgba: np.ndarray, strength: int = 19) -> np.ndarray:
    """The embedding API (optimizeForAverageFilter, pngloss_image.c:29):
    fixed bleed=2, no row-filter output, every row must self-consistently
    pass libpng's adaptive heuristic. Returns the quantized RGBA array."""
    q, _ = optimize_rgba(rgba, strength, bleed=2, use_row_filters=False)
    return q


def optimize_with_stride(buffer: np.ndarray, width: int, height: int,
                         stride: int, strength: int = 19, bleed: int = 2,
                         use_row_filters: bool = True):
    """Stride-buffer embedding entry (optimize_with_stride,
    pngloss_image.c:40-50): `buffer` is a flat uint8 array holding RGBA rows
    `stride` bytes apart; pixels are modified IN PLACE, and the per-row
    filter choices are returned."""
    buf = buffer.reshape(-1)
    rgba = np.stack([
        buf[y * stride: y * stride + width * 4].reshape(width, 4)
        for y in range(height)
    ])
    q, filters = optimize_rgba(rgba, strength, bleed,
                               use_row_filters=use_row_filters)
    for y in range(height):
        buf[y * stride: y * stride + width * 4] = q[y].reshape(-1)
    return filters


def optimize_rgba_batch(rgbas, strength=19, bleed: int = 2, *,
                        use_row_filters: bool = True, mesh=None,
                        impl: str = "auto"):
    """Optimize a list of RGBA images, bucketing by working shape so each
    distinct (H, W, bpp) compiles once and same-shaped images batch together.
    strength: one int for all images, or a per-image sequence — mixed
    strengths still share one device dispatch per bucket (the band math is
    per-lane). impl selects the device path: 'auto' (Pallas kernel on TPU,
    pure XLA elsewhere), 'pallas', or 'xla'.
    Returns (list of quantized RGBA, list of row_filters)."""
    per_image = not np.isscalar(strength)
    if per_image:
        strength = list(strength)
        assert len(strength) == len(rgbas)
    works, bpps = [], []
    for rgba in rgbas:
        work, bpp = reduce_colorspace(rgba)
        works.append(work)
        bpps.append(bpp)

    buckets: dict[tuple[int, int, int], list[int]] = {}
    for i, (wk, bpp) in enumerate(zip(works, bpps)):
        buckets.setdefault((wk.shape[0], wk.shape[1], bpp), []).append(i)

    q_out: list[np.ndarray | None] = [None] * len(rgbas)
    f_out: list[np.ndarray | None] = [None] * len(rgbas)
    for (h, wb, bpp), idxs in buckets.items():
        batch = np.stack([works[i] for i in idxs])
        s = (np.asarray([strength[i] for i in idxs], np.int32)
             if per_image else strength)
        with tracing.stage(f"device_optimize_{h}x{wb // bpp}x{bpp}"):
            if mesh is not None:
                qb, fb = optimize_batch_sharded(
                    batch, s, bleed, bpp=bpp,
                    use_row_filters=use_row_filters, mesh=mesh, impl=impl)
            else:
                qb, fb = optimize_batch_auto(
                    batch, s, bleed, bpp=bpp,
                    use_row_filters=use_row_filters, impl=impl)
                qb, fb = np.asarray(qb), np.asarray(fb)
        for j, i in enumerate(idxs):
            w = rgbas[i].shape[1]
            q_out[i] = restore_colorspace(qb[j], bpp, w)
            f_out[i] = fb[j]
    return q_out, f_out


@dataclasses.dataclass
class CompressResult:
    """Per-file outcome of a batch compression run."""
    data: bytes | None = None          # compressed PNG, or None on error/skip
    error: Exception | None = None
    input_size: int = 0
    output_size: int = 0
    metadata_size: int = 0


def compress_bytes(data: bytes, strength: int = 19, bleed: int = 2, *,
                   strip: bool = False, skip_if_larger: bool = False,
                   mesh=None) -> bytes:
    """Compress one PNG file's bytes (pngloss_file_internal, pngloss.c:226).
    Raises codec.TooLargeFile when skip_if_larger is set and the output would
    not be smaller than the input."""
    return compress_many([data], strength, bleed, strip=strip,
                         skip_if_larger=skip_if_larger, mesh=mesh)[0].unwrap()


def _unwrap(self: CompressResult) -> bytes:
    if self.error is not None:
        raise self.error
    assert self.data is not None
    return self.data


CompressResult.unwrap = _unwrap


def compress_many(files, strength: int = 19, bleed: int = 2, *,
                  strip: bool = False, skip_if_larger: bool = False,
                  mesh=None, decode_workers: int = 0,
                  impl: str = "auto") -> list[CompressResult]:
    """Compress many PNG byte strings as one batched device dispatch.

    This is the TPU-native form of the reference's run_suite.sh workload
    (1,089 sequential process invocations, SURVEY.md §3.4): decode on host
    threads, one device program per shape bucket, DEFLATE on host threads.
    """
    results = [CompressResult() for _ in files]

    def _decode(data: bytes) -> DecodedImage:
        with tracing.stage("host_decode"):
            return codec.decode(data, strip=strip)

    # dedup identical inputs (e.g. the suite's same-file-many-strengths
    # pattern): decode each distinct byte string once
    distinct: dict[bytes, list[int]] = {}
    for i, d in enumerate(files):
        distinct.setdefault(d, []).append(i)
    decoded: list = [None] * len(files)
    work_items = [(idxs, files[idxs[0]]) for idxs in distinct.values()]
    if decode_workers > 1:
        with _futures.ThreadPoolExecutor(decode_workers) as pool:
            uniq = list(pool.map(lambda it: _try(_decode, it[1]), work_items))
    else:
        uniq = [_try(_decode, it[1]) for it in work_items]
    for (idxs, _), res in zip(work_items, uniq):
        for i in idxs:
            decoded[i] = res

    ok_idx = []
    rgbas = []
    for i, (img, err) in enumerate(decoded):
        results[i].input_size = len(files[i])
        if err is not None:
            results[i].error = err
        else:
            ok_idx.append(i)
            rgbas.append(img.rgba)

    qs, fs = optimize_rgba_batch(rgbas, strength, bleed, mesh=mesh, impl=impl)

    def _encode(j: int) -> None:
        i = ok_idx[j]
        img = decoded[i][0]
        max_size = results[i].input_size - 1 if skip_if_larger else 0
        try:
            with tracing.stage("host_encode"):
                out = codec.encode(
                    qs[j], row_filters=fs[j], gamma=img.gamma,
                    color_transform=img.color_transform, chunks=img.chunks,
                    maximum_file_size=max_size)
        except Exception as e:  # TooLargeFile and friends
            results[i].error = e
            return
        results[i].data = out
        results[i].output_size = len(out)
        results[i].metadata_size = sum(
            len(c.data) + 12 for c in img.chunks)

    if decode_workers > 1:
        with _futures.ThreadPoolExecutor(decode_workers) as pool:
            list(pool.map(_encode, range(len(ok_idx))))
    else:
        for j in range(len(ok_idx)):
            _encode(j)
    return results


def _try(fn, arg):
    try:
        return fn(arg), None
    except Exception as e:
        return None, e
