"""Whole-image Pallas kernel: rows 1..H-1 in ONE kernel launch.

Profiling showed the per-row pipeline spends ~2/3 of its time outside the
pixel scan: 512 kernel launches per image batch, per-row HBM round-trips of
every carried buffer, and the XLA glue (tiling, winner selection, cost)
between launches. This kernel eliminates all of it by keeping the carried
state resident in VMEM across rows and running the row loop as a Pallas
GRID over y (the TPU grid is sequential, so VMEM scratch persists across
steps and the original rows stream in / quantized rows stream out through
the automatic block pipeline).

Two structural observations make this tractable:
  * In CLI mode (row_filters recorded) only ROW 0 runs the adaptive MSAD
    self-check (pngloss_image.c:209-210), so rows >= 1 can never fail and
    the strength-fallback while-loop (pngloss_image.c:266-275) is
    unreachable — the whole-image kernel needs exactly one attempt per row,
    no scalar-cond loop. Row 0 is computed by the existing per-row path and
    seeds this kernel's state.
  * The winner filter's state must be re-broadcast to all 5 filter lane
    blocks between rows. With filter-major lanes this is
        sum over k of roll_lanes(mask * X, k*B)
    — static lane rotations, no gathers (mask selects the winning block,
    the circular roll-sum replicates it into every block).

Everything else (row cost via the histogram-delta identity, derivative
error with 8-row group sums via static sublane rolls, packed-key symbol
selection) is dense vector work inherited from the per-row design.
Packed-key mode only (the caller gates on image size; huge images fall
back to the per-row path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pngloss_tpu.ops.pallas_row import (
    NUM_FILTERS,
    STRIDE,
    _rotated_window,
    _sierra_splits,
    _tdiv_pos,
)


# Ablation switch for tools/ablate.py ONLY (docs/ROOFLINE.md's budget
# table): "nosel" takes the original symbol without the windowed argmax,
# "noupdate" freezes the adaptive histogram, "both" does both.  Each
# variant INTENTIONALLY breaks byte parity; production must run with the
# variable unset (ablate.py isolates each variant in its own process, so
# in-process program caches never mix variants).
#
# Comma-composable SUB-SKELETON flags (round-5 verdict item 1: the
# skeleton is the majority of device time and its terms must be pinned
# by measurement) — each removes one skeleton stage, measured on top of
# "both":  "nosierra" drops the whole diffusion (math + register window
# + error-buffer traffic), "nosierramath" only the truncating-division
# chain (window traffic stays), "noderiv" the derivative error (math +
# the oprev read), "nopred" the predictor arithmetic, "noband" the band
# math, and "shell" composes all of them — the irreducible scan shell
# (block reads, qrow write, loop control).
_ABLATE = set(f for f in os.environ.get("PNGLOSS_ABLATE", "").split(",") if f)
if "shell" in _ABLATE:
    _ABLATE |= {"both", "nosierra", "noderiv", "nopred", "noband"}
_ABLATE_NOSEL = bool(_ABLATE & {"nosel", "both"})
_ABLATE_NOUPDATE = bool(_ABLATE & {"noupdate", "both"})
_ABLATE_NOSIERRA = "nosierra" in _ABLATE
_ABLATE_NOSIERRAMATH = "nosierramath" in _ABLATE
_ABLATE_NODERIV = "noderiv" in _ABLATE
_ABLATE_NOPRED = "nopred" in _ABLATE
_ABLATE_NOBAND = "noband" in _ABLATE
# "rot128": run the barrel rotation on the table's first 128 rows only
# (WRONG results — windows crossing row 128 wrap early) to measure the
# rotation's vreg-traffic sensitivity: dropping the leading bit-7 stage
# removes the same dense-stage traffic an exact int16 base+delta split
# would save, upper-bounding what that split could recover (verdict item
# 3b).  The split itself cannot be measured directly: Mosaic has no
# 16-bit rotate (`tpu.dynamic_rotate` on i16 -> "not implemented:
# Rotate with non-32-bit data", jax 0.8.x / libtpu 2026-08).
_ABLATE_ROT128 = "rot128" in _ABLATE


def _roll_bcast(x, b: int):
    """Replicate the (masked) winning lane block into all 5 blocks:
    out(f, i) = sum_k x(k, i) for filter-major lanes of width b."""
    out = x
    for k in range(1, NUM_FILTERS):
        out = out + pltpu.roll(x, k * b, axis=1)
    return out


def _bitlength(n):
    """bitlength(n) for int32 0 < n < 2^24 via the f32 exponent field
    (exact: the conversion is exact below 2^24). Returns garbage for n<=0 —
    callers mask. Avoids relying on a clz lowering."""
    f = n.astype(jnp.float32)
    exp = (lax.bitcast_convert_type(f, jnp.int32) >> 23) & 0xFF
    return exp - 126  # floor(log2 n) + 1


def _image_kernel(s_ref, bleed_ref, wr_ref, rank_ref, orig_row_ref,
                  qprev0_ref, oprev0_ref, e00_ref, e10_ref, hist0_ref,
                  qrow_out_ref, filt_out_ref, ok_out_ref,
                  err0_s, e0n_s, e1n_s, hist_s, qprev_s, oprev_s,
                  orig_s, qrow_s, dma_sem,
                  *, w: int, bpp: int, b: int, table: int, wmax: int = 0,
                  adaptive: bool = False, fast_div: bool = False):
    """Grid over y = 1..H-1 (program_id 0 = y-1). Shapes (L = 5B lanes):
      s_ref       (1, L)        per-lane strength
      bleed_ref   (1, 1)        SMEM
      wr_ref      (1, L)        per-lane real width (ragged batching:
                  pixels x >= wr neither count in the histogram/cost nor
                  diffuse error; padded ROWS need no mask — they follow
                  every real row, so nothing real depends on them)
      rank_ref    (TABLE, L)    8-bit ofreq ranks (packed-key payload)
      orig_row_ref(1, 8W, B)    this row's original pixels (blocked input,
                  UN-tiled batch lanes: the 5-filter replication to L lanes
                  happens in-kernel via an exact bf16 selection matmul, so
                  the streamed HBM array is 5x smaller than the lane layout)
      qprev0_ref / oprev0_ref / e00_ref / e10_ref / hist0_ref:
                  row-0 winner state (read at the first grid step)
      qrow_out_ref(1, 8W, B)    quantized winner row (blocked output,
                  B lanes — extracted in-kernel by a selection matmul)
      filt_out_ref(1, 1, B)     winner filter id per image (blocked output)
      *_s         VMEM scratch persisting across grid steps; orig_s/qrow_s
                  hold the L-lane tiled original / candidate rows (lane
                  slicing at non-128 boundaries is not Mosaic-lowerable,
                  so the narrow blocks cannot double as scratch)
    """
    l5 = s_ref.shape[1]
    # one correction step in the reciprocal-multiply divisions when the
    # caller proved the operand domain < 2^16 (pallas_row._tdiv_pos)
    ndiv = 1 if fast_div else 2
    bleed = bleed_ref[0, 0]
    s = s_ref[:, :]
    band = s + 1
    # loop-invariant reciprocals for the in-scan truncating divisions
    # (identical expressions to what _tdiv would compute per step, hoisted
    # — Mosaic does not reliably hoist them out of the fori_loop itself)
    rband = 1.0 / band.astype(jnp.float32)
    rbleed = 1.0 / bleed.astype(jnp.float32)
    r9 = 1.0 / jnp.float32(9)
    iota_t = lax.broadcasted_iota(jnp.int32, (table, 1), 0)
    f_lane = lax.broadcasted_iota(jnp.int32, (1, l5), 1) // (l5 // 5)
    y = pl.program_id(0)

    @pl.when(y == 0)
    def _init():
        # the row-0 state inputs stay HBM-resident (they are read once;
        # keeping them out of the scoped VMEM budget is what lets the
        # batch fit) — copy them in explicitly
        for src, dst in ((qprev0_ref, qprev_s), (oprev0_ref, oprev_s),
                         (e00_ref, err0_s), (e10_ref, e0n_s),
                         (hist0_ref, hist_s)):
            cp = pltpu.make_async_copy(src, dst, dma_sem)
            cp.start()
            cp.wait()

    # (e1n_s is NOT zeroed here: the scan below writes every column of it
    # exactly once — finalized window columns in-loop, edges in the flush)
    # packed-key work table (freq*256 + per-filter rank); the carried
    # histogram hist_s holds plain winner frequencies
    hw_seed = hist_s[:, :] * 256 + rank_ref[:, :]
    hist_s[:, :] = hw_seed

    # replicate this row's B-lane original block into all 5 filter blocks:
    # orig_s = orig @ E with E[i, j] = (j mod b == i). Exact arithmetic:
    # pixel bytes (<= 255) are exact in bf16 and each output element sums
    # exactly one nonzero product in f32. One tiny MXU op replaces the
    # XLA-side 5x lane tile (and 5x of the streamed input HBM traffic).
    e_tile = (lax.broadcasted_iota(jnp.int32, (b, l5), 0)
              == lax.broadcasted_iota(jnp.int32, (b, l5), 1) % b)
    orig_s[:, :] = jnp.dot(
        orig_row_ref[0, :, :].astype(jnp.bfloat16),
        e_tile.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32).astype(jnp.int32)

    ri8 = lax.broadcasted_iota(jnp.int32, (STRIDE, l5), 0)
    # per-row derivative-error weights: how many of the 4 color_delta
    # lanes each channel feeds (rows >= bpp weigh 0, masking the stride
    # padding) — a compile-time constant (8, L) array
    wgt_list = {1: [3], 2: [3, 1], 3: [1, 1, 1], 4: [1, 1, 1, 1]}[bpp]
    w8 = jnp.zeros((STRIDE, l5), jnp.int32)
    for c, wg in enumerate(wgt_list):
        w8 = jnp.where(ri8 == c, wg, w8)

    def body_core(x, carry, orig_px, above_px, oprev_px, ce_mem):
        # all carries are (8, L) pixel blocks; channel-independent math
        # runs once on the whole block (channels on sublanes) and only the
        # histogram-coupled selection runs per channel.  The Sierra error
        # window rides in REGISTERS (p_*/n*/m* below): step x's diffusion
        # lands at columns x..x+4, which later steps consume within 4
        # steps, so a sliding register window finalizes each error column
        # with ONE memory op instead of the 10 per-step read-modify-writes
        # the buffers would otherwise take (the adds happen in the same
        # order, so the committed values are bit-identical).
        # orig_px/above_px/oprev_px/ce_mem arrive pre-read (the unrolled
        # pair loop fetches them as (16, L) blocks shared by two pixels;
        # all four source buffers are read-only during the scan).
        (left8, prev_above, prev_orig, prev_oprev, e_hi8, e_lo8, msad,
         p_a, p_b, n1, n2, n3, n4, m2, m3) = carry
        cmask = (x < wr_ref[:, :]).astype(jnp.int32)        # (1, L)
        # the carried-error value: the seeded buffer (previous row's
        # diffusion) plus the pending in-register contributions from the
        # last two steps (rem at x-1, threes at x-2)
        ce_px = ce_mem + p_a

        # ---- channel-batched predictor + band math on (8, L) blocks ----
        if _ABLATE_NOPRED:
            avg = paeth = pred8 = left8   # ablation: skip predictor math
        else:
            avg = (above_px + left8) >> 1
            p = above_px - prev_above
            pd = left8 - prev_above
            p_left = jnp.abs(p)
            p_above = jnp.abs(pd)
            p_d = jnp.abs(p + pd)
            paeth = jnp.where(
                (p_left <= p_above) & (p_left <= p_d), left8,
                jnp.where(p_above <= p_d, above_px, prev_above))
            pred8 = jnp.where(
                f_lane == 1, left8,
                jnp.where(f_lane == 2, above_px,
                          jnp.where(f_lane == 3, avg,
                                    jnp.where(f_lane == 4, paeth, 0))))
        if bpp == 2:
            # gray+alpha: the alpha channel (row 1) reads dither lane 3
            # (color_delta.c:9-39) — remap by a static sublane roll
            ce8 = jnp.where(ri8 == 1, pltpu.roll(ce_px, STRIDE - 2, axis=0),
                            ce_px)
        else:
            ce8 = ce_px
        here8 = orig_px + ce8

        osym8 = orig_px - pred8
        predw8 = pred8 + jnp.where(osym8 < -128, -256,
                                   jnp.where(osym8 > 127, 256, 0))
        osym8 = orig_px - predw8
        filt8 = here8 - predw8

        if _ABLATE_NOBAND:
            mn8 = osym8                   # ablation: skip band math
            start8 = mn8 & 0xFF
            width8 = jnp.zeros_like(mn8)
            u_orig8 = jnp.zeros_like(mn8)
        else:
            q8 = _tdiv_pos(jnp.abs(filt8), band, rband, ndiv)
            mn8 = jnp.where(filt8 < 0, -q8 * band - s, q8 * band)
            mx8 = mn8 + s
            mn8 = jnp.where(mn8 + predw8 < 0, -predw8, mn8)
            mx8 = jnp.where(mx8 + predw8 > 255, 255 - predw8, mx8)
            inv = mx8 < mn8
            over = inv & (filt8 + predw8 > 255)
            under = inv & (filt8 + predw8 < 0)
            mn8 = jnp.where(over, 255 - predw8,
                            jnp.where(under, -predw8, mn8))
            mx8 = jnp.where(over, 255 - predw8,
                            jnp.where(under, -predw8, mx8))
            start8 = mn8 & 0xFF
            width8 = mx8 - mn8
            u_orig8 = osym8 - mn8

        # ---- per-channel: histogram-coupled selection + update ----
        # In the rotated-window path the dense 256-row histogram update
        # is DEFERRED to the end of the pixel: within a pixel the stale
        # table plus the <= bpp-1 pending one-hots is exact, and a
        # pending applied inside the rotated window costs a compare over
        # ~wmax+9 rows instead of 256 — so bpp dense update passes per
        # pixel become one (batched: Σ one-hots in a single pass).  The
        # dense selection path keeps immediate updates: there the
        # in-window application would itself be a 256-row pass, saving
        # nothing.
        back8 = jnp.zeros((STRIDE, l5), jnp.int32)
        hist = hist_s[:, :]           # one table read per pixel
        pend_syms = []                # this pixel's already-chosen symbols
        for c in range(bpp):
            start = start8[c:c + 1, :]
            width = width8[c:c + 1, :]
            u_orig = u_orig8[c:c + 1, :]
            if _ABLATE_NOSEL:
                sel = jnp.full_like(u_orig, -1)  # ablation: skip selection
            elif wmax:
                # small-strength fast path: barrel-rotate the window to
                # rows [0, width] so the selection reductions sweep
                # ~(wmax+9) rows instead of 256 (width <= strength <= wmax,
                # guaranteed by the caller's class choice)
                if _ABLATE_ROT128:
                    rot = _rotated_window(hist[:128], start & 127, wmax,
                                          rows=128)
                else:
                    rot = _rotated_window(hist, start, wmax)
                iota_w = lax.broadcasted_iota(
                    jnp.int32, (rot.shape[0], 1), 0)
                for ps in pend_syms:
                    # pending one-hot, applied in the rotated domain: row
                    # u maps to table index (start+u)&0xFF, so symbol ps
                    # sits at u = (ps-start)&0xFF; if that exceeds the
                    # swept rows it also exceeds width, where the mask
                    # below discards the row anyway
                    rot = rot + jnp.where(
                        iota_w == ((ps - start) & 0xFF), 256 * cmask, 0)
                masked = jnp.where(iota_w <= width, rot, -1)
                kmax = jnp.max(masked, axis=0, keepdims=True)
                u_adj = jnp.where(iota_w == u_orig, -1, iota_w)
                sel = jnp.min(jnp.where(masked == kmax, u_adj, 256),
                              axis=0, keepdims=True)
            else:
                u = (iota_t - start) & 0xFF
                masked = jnp.where(u <= width, hist, -1)
                kmax = jnp.max(masked, axis=0, keepdims=True)
                u_adj = jnp.where(u == u_orig, -1, u)
                sel = jnp.min(jnp.where(masked == kmax, u_adj, 256),
                              axis=0, keepdims=True)
            u_best = jnp.where(sel < 0, u_orig, sel)
            sym_byte = (start + u_best) & 0xFF
            back_c = u_best + mn8[c:c + 1, :] + predw8[c:c + 1, :]

            if bpp % 2 == 0 and c == bpp - 1:
                transp = orig_px[c:c + 1, :] == 0
                back_c = jnp.where(transp, 0, back_c)
                sym_byte = jnp.where(
                    transp, (0 - pred8[c:c + 1, :]) & 0xFF, sym_byte)

            if not _ABLATE_NOUPDATE:
                if wmax:
                    pend_syms.append(sym_byte)
                else:
                    hist = hist + (iota_t == sym_byte) * (256 * cmask)
                    hist_s[:, :] = hist
            back8 = jnp.where(ri8 == c, back_c, back8)
        if pend_syms:
            inc = (iota_t == pend_syms[0]).astype(jnp.int32)
            for ps in pend_syms[1:]:
                inc = inc + (iota_t == ps)
            hist_s[:, :] = hist + inc * (256 * cmask)

        qrow_s[pl.ds(pl.multiple_of(x * STRIDE, 8), STRIDE), :] = back8

        if adaptive:
            # embedding mode (row_filters == NULL): accumulate libpng's
            # 5 trial MSAD sums of the QUANTIZED row in-scan — every
            # trial predictor of the quantized neighbors is already at
            # hand (optimize_state.c:492-562 via adaptive rows)
            new_msad = []
            for t, tp in enumerate((None, left8, above_px, avg, paeth)):
                v = (back8 if tp is None else (back8 - tp)) & 0xFF
                v = jnp.where(v < 128, v, 256 - v)
                new_msad.append(msad[t] + v * cmask)
            msad = tuple(new_msad)

        # ---- channel-batched derivative error (optimize_state.c:265-289)
        # accumulated per (channel-row, lane) with the exact /128 split —
        # the identity sum(e) = 128*sum(e>>7) + sum(e&127) holds for any
        # grouping, so the row-end reduce recovers the C totals exactly
        if not _ABLATE_NODERIV:
            d_above = (back8 - above_px) - (orig_px - oprev_px)
            d_diag = (back8 - prev_above) - (orig_px - prev_oprev)
            d_left = (back8 - left8) - (orig_px - prev_orig)
            e_px8 = w8 * (d_above * d_above + d_diag * d_diag
                          + d_left * d_left) * cmask
            e_hi8 = e_hi8 + (e_px8 >> 7)
            e_lo8 = e_lo8 + (e_px8 & 127)

        # ---- channel-batched Sierra diffusion (optimize_state.c:390-490)
        # on the dither-lane layout. The transparent-pixel rule forces
        # here == back == 0, so the alpha diff is zeroed where transparent.
        if _ABLATE_NOSIERRA:
            # ablation: no diffusion at all — lane mapping, division
            # chain, register window and error-buffer traffic all gone
            return (back8, above_px, orig_px, oprev_px, e_hi8, e_lo8,
                    msad, p_a, p_b, n1, n2, n3, n4, m2, m3)
        diffs8 = (here8 - back8) * cmask
        if bpp % 2 == 0:
            transp8 = (ri8 == bpp - 1) & (orig_px == 0)
            diffs8 = jnp.where(transp8, 0, diffs8)
        if bpp == 1:
            # dither lanes 1, 2 replicate lane 0 in the C buffers but are
            # never read back (only lane c < bpp and lane 3 for bpp == 2
            # feed `here`), so they are dropped here
            dl8 = jnp.where(ri8 == 0, diffs8, 0)
        elif bpp == 2:
            dl8 = jnp.where(ri8 == 3, pltpu.roll(diffs8, 2, axis=0),
                            jnp.where(ri8 == 0, diffs8, 0))
        else:
            dl8 = diffs8       # identity lane map; padding rows are zero
        if _ABLATE_NOSIERRAMATH:
            # ablation: skip the truncating-division chain, keep the
            # register window + error-buffer traffic
            twos8 = threes8 = fours8 = five8 = rem8 = dl8
        else:
            twos8, threes8, fours8, five8, rem8 = _sierra_splits(
                dl8, bleed, rbleed, r9, ndiv)

        # slide the register error windows. err0 (current row, cols x+3 /
        # x+4) is never written to memory at all: its only reader is the
        # ce fetch above, which absorbs the pendings before the buffer is
        # overwritten at winner commit. e0n (next row, cols x..x+4)
        # finalizes col x = seed + pendings with one read-modify-write;
        # e1n (row after, cols x+1..x+3) has a zero seed, so col x+1 is a
        # pure write (which also replaces the old full-buffer memset).
        if not _ABLATE_NOSIERRA:
            colx = pl.ds(pl.multiple_of(x * STRIDE, 8), STRIDE)
            e0n_s[colx, :] = e0n_s[colx, :] + (n1 + twos8)
            n1, n2, n3, n4 = n2 + fours8, n3 + five8, n4 + fours8, twos8
            colx1 = pl.ds(pl.multiple_of((x + 1) * STRIDE, 8), STRIDE)
            e1n_s[colx1, :] = m2 + twos8
            m2, m3 = m3 + threes8, twos8
            p_a, p_b = p_b + rem8, threes8

        return (back8, above_px, orig_px, oprev_px, e_hi8, e_lo8, msad,
                p_a, p_b, n1, n2, n3, n4, m2, m3)

    z8 = jnp.zeros((STRIDE, l5), jnp.int32)
    msad0 = tuple(z8 for _ in range(NUM_FILTERS)) if adaptive else ()
    carry = (z8, z8, z8, z8, z8, z8, msad0,
             z8, z8, z8, z8, z8, z8, z8, z8)

    # unroll-by-2: the 15-element (8, L) carry crosses the loop boundary
    # once per TWO pixels (halving the loop-control/carry shuffle share
    # of the scan shell — ABLATE_r5: shell = 43% of device time), and the
    # four read-only per-pixel fetches (orig, qprev, oprev, carried
    # error) become shared (16, L) block loads sliced per pixel.  The
    # body runs identically per pixel, so results are bit-identical by
    # construction.  Odd widths take a static single-pixel epilogue.
    def read_one(x):
        sl = pl.ds(pl.multiple_of(x * STRIDE, 8), STRIDE)
        orig_px = orig_s[sl, :]
        above_px = qprev_s[sl, :]
        # (the oprev read exists only for the derivative error — its
        # cost belongs to the noderiv ablation term)
        oprev_px = orig_px if _ABLATE_NODERIV else oprev_s[sl, :]
        ce_mem = err0_s[
            pl.ds(pl.multiple_of((x + 2) * STRIDE, 8), STRIDE), :]
        return orig_px, above_px, oprev_px, ce_mem

    def body(x, c):
        return body_core(x, c, *read_one(x))

    def body2(i, c):
        x = 2 * i
        sl2 = pl.ds(pl.multiple_of(x * STRIDE, 8), 2 * STRIDE)
        orig2 = orig_s[sl2, :]
        above2 = qprev_s[sl2, :]
        oprev2 = orig2 if _ABLATE_NODERIV else oprev_s[sl2, :]
        ce2 = err0_s[
            pl.ds(pl.multiple_of((x + 2) * STRIDE, 8), 2 * STRIDE), :]
        c = body_core(x, c, orig2[:STRIDE], above2[:STRIDE],
                      oprev2[:STRIDE], ce2[:STRIDE])
        return body_core(x + 1, c, orig2[STRIDE:], above2[STRIDE:],
                         oprev2[STRIDE:], ce2[STRIDE:])

    carry = lax.fori_loop(0, w // 2, body2, carry)
    if w % 2:
        carry = body(w - 1, carry)
    (_, _, _, _, e_hi8, e_lo8, msad,
     p_a, p_b, n1, n2, n3, n4, m2, m3) = carry

    # flush the register windows: e0n pendings map to cols w..w+3 (col
    # w+4 receives nothing — its seed stands), e1n pendings to cols
    # w+1 / w+2; e1n cols 0 and w+3 / w+4 are never written in-loop and
    # must read zero (the memset they used to get is gone)
    for i, reg in enumerate((n1, n2, n3, n4)):
        cf = pl.ds((w + i) * STRIDE, STRIDE)
        e0n_s[cf, :] = e0n_s[cf, :] + reg
    e1n_s[pl.ds((w + 1) * STRIDE, STRIDE), :] = m2
    e1n_s[pl.ds((w + 2) * STRIDE, STRIDE), :] = m3
    e1n_s[pl.ds(0, STRIDE), :] = z8
    e1n_s[pl.ds((w + 3) * STRIDE, 2 * STRIDE), :] = jnp.zeros(
        (2 * STRIDE, l5), jnp.int32)
    e_hi = jnp.sum(e_hi8, axis=0, keepdims=True)
    e_lo = jnp.sum(e_lo8, axis=0, keepdims=True)

    # ---- row cost (hist-delta identity) + derivative error, per lane ----
    hw = hist_s[:, :]
    counts = (hw[:256] - hw_seed[:256]) >> 8
    freq = hw[:256] >> 8
    bits = jnp.where(freq > 0, 65 - _bitlength(freq), 0)
    total_cost = jnp.sum(counts * bits, axis=0, keepdims=True)   # (1, L)

    cost = total_cost + e_hi + (e_lo >> 7)
    passing = None
    if adaptive:
        # first-minimum argmin over the 5 trial sums (the C >= cascade
        # resolves ties to the earliest filter): pack sum*8 + t and min
        sums = [jnp.sum(m, axis=0, keepdims=True) for m in msad]
        best = sums[0] * 8
        for t in range(1, NUM_FILTERS):
            best = jnp.minimum(best, sums[t] * 8 + t)
        passing = ((best & 7) == f_lane).astype(jnp.int32)
        # a failing filter costs UINTMAX_MAX (optimize_state.c:319-324);
        # rows where no filter passes are flagged via ok_out and the
        # whole image is re-run through the per-row fallback path
        cost = jnp.where(passing > 0, cost, jnp.int32(1 << 30))
    qrow = qrow_s[:, :]
    orig = orig_s[:, :]

    # ---- winner mask: min cost over the 5 filter blocks, ties -> lowest f.
    # The circular roll-min places the global per-image minimum in EVERY
    # lane; earlier_eq(f) = any block < f also achieving it (roll +k*b
    # brings block f-k's value to block f, gated on f >= k).
    mall = cost
    for k in range(1, NUM_FILTERS):
        mall = jnp.minimum(
            mall, pltpu.roll(cost, NUM_FILTERS * b - k * b, axis=1))
    eq = (cost == mall).astype(jnp.int32)
    earlier = jnp.zeros_like(eq)
    for k in range(1, NUM_FILTERS):
        earlier = earlier + jnp.where(
            f_lane >= k, pltpu.roll(eq, k * b, axis=1), 0)
    maski = eq * (earlier == 0)

    # ---- commit winner state (broadcast via masked roll-sum). Each
    # broadcast accumulates into its destination ref holding ONE masked
    # temporary — naive expressions kept several row-sized temporaries
    # live at once and blew the ~33MB scoped-VMEM ceiling ----
    # B-lane outputs via the block-sum selection matmul E3[j, i] =
    # (j mod b == i): maski zeroes all but the winning block, so the sum
    # over blocks IS the winner (values <= 255, exact in bf16/f32)
    e_sel = (lax.broadcasted_iota(jnp.int32, (l5, b), 0) % b
             == lax.broadcasted_iota(jnp.int32, (l5, b), 1)).astype(jnp.bfloat16)
    filt_out_ref[0, :, :] = jnp.dot(
        (maski * f_lane).astype(jnp.bfloat16), e_sel,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    if adaptive:
        # per-image count of passing filters (0 = this row failed)
        ok_out_ref[0, :, :] = jnp.dot(
            passing.astype(jnp.bfloat16), e_sel,
            preferred_element_type=jnp.float32).astype(jnp.int32)
    else:
        ok_out_ref[0, :, :] = jnp.ones_like(ok_out_ref[0, :, :])
    hist_s[:, :] = _roll_bcast(maski * (hw >> 8), b)

    def bcast_into(dst, masked):
        dst[:, :] = masked
        for k in range(1, NUM_FILTERS):
            dst[:, :] = dst[:, :] + pltpu.roll(masked, k * b, axis=1)

    mq = maski * qrow
    qrow_out_ref[0, :, :] = jnp.dot(
        mq.astype(jnp.bfloat16), e_sel,
        preferred_element_type=jnp.float32).astype(jnp.int32)
    bcast_into(qprev_s, mq)
    del mq
    m0 = maski * e0n_s[:, :]
    bcast_into(err0_s, m0)
    del m0
    m1 = maski * e1n_s[:, :]
    bcast_into(e0n_s, m1)
    del m1
    oprev_s[:, :] = orig


def vmem_limit_bytes() -> int:
    """Per-kernel VMEM budget. 64MB default: v5e kernels up to ~80MB
    compiled and ran in testing (the round-1 '33MB ceiling' was just the
    default limit), and 64MB covers every 128-lane image-kernel shape the
    eligibility rule admits. PNGLOSS_VMEM_LIMIT_MB overrides."""
    import os

    return int(os.environ.get("PNGLOSS_VMEM_LIMIT_MB", "64")) << 20


def _rows_budget(w: int) -> int:
    # int32 rows per lane: 8 pixel-row buffers (orig in x2 + qrow out x2
    # double-buffered — B-lane blocks, but VMEM pads lanes to 128 so they
    # cost the same as L-lane; qprev/oprev/orig_s/qrow_s scratch), 3 dither
    # buffers, the table (modular: exactly 256 rows for every strength)
    return 8 * STRIDE * w + 3 * STRIDE * (w + 5) + 256


def max_batch_image(w: int, bpp: int, band_pad: int = 0,
                    h: int | None = None) -> int:
    """Batch size for the whole-image kernel, or 0 when no batch fits the
    VMEM budget (caller falls back to the per-row kernel). band_pad is
    accepted for API compatibility; the modular table is strength-free.

    VMEM footprint is driven by LANE-PADDED buffer widths (lanes round up
    to 128): bytes ~= 4 * lanes_pad * rows_budget + temporaries headroom.
    The VPU saturates at ~128 lanes (measured: B=25/125 lanes 6.5 MP/s,
    B=51/256 lanes 6.0), so batches are capped at 25 — more lanes cost
    linearly more time for no throughput.

    When h is given, the batch is also capped so the HBM-resident streamed
    arrays (the stride-8 original rows in and quantized rows out, ~64*h*w
    bytes per image, plus transpose copies) stay within a few GB: a bucket
    of tall-narrow images passes the width-driven VMEM check but can
    otherwise exhaust the 16 GB of HBM (e.g. 25 x 512x16000 gray ~ 13 GB
    streamed)."""
    import os

    del band_pad
    cap = int(os.environ.get("PNGLOSS_IMAGE_BATCH_CAP", "25"))
    if h is not None:
        hbm_budget = int(os.environ.get("PNGLOSS_HBM_STREAM_MB", "4096")) << 20
        per_image = 2 * h * STRIDE * w * 4   # orig in + qrows out, int32
        cap = min(cap, max(1, hbm_budget // max(per_image, 1)))
    budget = vmem_limit_bytes() - (3 << 20)
    best = 0
    for b in range(1, cap + 1):
        lanes = -(-NUM_FILTERS * b // 128) * 128
        if 4 * lanes * _rows_budget(w) <= budget:
            best = b
    return best


@functools.partial(jax.jit, static_argnames=(
    "w", "h", "bpp", "b", "table", "interpret", "wmax", "adaptive",
    "fast_div"))
def image_rows_pallas(s5, bleed, wr5, rank5, orig_rows, qprev0, oprev0, e00,
                      e10, hist0, *, w: int, h: int, bpp: int, b: int,
                      table: int, interpret: bool = False, wmax: int = 0,
                      adaptive: bool = False, fast_div: bool = False):
    """Run rows 1..H-1 in one kernel. orig_rows: (H-1, 8W, B) un-tiled
    original rows 1..H-1 (the kernel replicates to L lanes itself); the
    row-0 winner state seeds the scratch. wr5: (1, L) per-lane real widths
    (ragged batching). wmax: 0 = dense 256-row selection; a positive value
    compiles the rotated-window fast path (every lane's strength must be
    <= wmax). adaptive: embedding-mode speculation — every row runs the
    libpng MSAD self-check; failing filters cost ~inf and rows where no
    filter passes report ok == 0. Returns (qrows (H-1, 8W, B) winner
    rows, filters (H-1, 1, B), ok (H-1, 1, B) passing-filter counts,
    all-ones when not adaptive)."""
    l5 = NUM_FILTERS * b
    rows_px = STRIDE * w
    rows_e = STRIDE * (w + 5)
    n = h - 1
    grid = (n,)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((n, rows_px, b), jnp.int32),
        jax.ShapeDtypeStruct((n, 1, b), jnp.int32),
        jax.ShapeDtypeStruct((n, 1, b), jnp.int32),
    )
    kernel = functools.partial(
        _image_kernel, w=w, bpp=bpp, b=b, table=table, wmax=wmax,
        adaptive=adaptive, fast_div=fast_div)
    vmem_bytes = vmem_limit_bytes()
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[
            vm, sm, vm, vm,
            pl.BlockSpec((1, rows_px, b), lambda y: (y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # qprev0 (HBM)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # oprev0 (HBM)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # e00 (HBM)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # e10 (HBM)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),   # hist0 (HBM)
        ],
        out_specs=(
            pl.BlockSpec((1, rows_px, b), lambda y: (y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda y: (y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda y: (y, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_e, l5), jnp.int32),   # err0
            pltpu.VMEM((rows_e, l5), jnp.int32),   # e0n (next row 1)
            pltpu.VMEM((rows_e, l5), jnp.int32),   # e1n (next row 2)
            pltpu.VMEM((table, l5), jnp.int32),    # hist (packed in-row)
            pltpu.VMEM((rows_px, l5), jnp.int32),  # qprev
            pltpu.VMEM((rows_px, l5), jnp.int32),  # oprev
            pltpu.VMEM((rows_px, l5), jnp.int32),  # orig_s (L-lane tiled)
            pltpu.VMEM((rows_px, l5), jnp.int32),  # qrow_s (candidates)
            pltpu.SemaphoreType.DMA,               # init-state copies
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(
        s5.astype(jnp.int32),
        jnp.reshape(bleed.astype(jnp.int32), (1, 1)),
        wr5.astype(jnp.int32),
        rank5, orig_rows, qprev0, oprev0, e00, e10, hist0,
    )
