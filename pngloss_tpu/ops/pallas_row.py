"""Pallas TPU kernel for the per-row quantization scan.

One kernel invocation quantizes ONE row of a whole image batch under ALL
five PNG filters simultaneously: the vector lanes are ordered filter-major
as (5, B) -> 5B, so each lane carries one (filter, image) pair.

Mosaic-friendly construction rules used throughout (lane/sublane concats of
non-tile-aligned vectors are unsupported on TPU):
  * every input arrives pre-tiled to 5B lanes from XLA (XLA has no layout
    constraints, so the 5x broadcast happens outside the kernel);
  * the per-filter predictor is selected by comparing a lane-id iota
    (lane // B == filter) — no concatenation, no dynamic indexing;
  * the three Sierra dither rows live as absolute-indexed VMEM buffers
    (a scratch buffer for the current row 0 and the two output buffers for
    next row's rows 0/1), updated with single-row read-modify-writes at
    positions derived from x — replacing the reference's sliding 3-row
    window (optimize_state.c:48-49, 344-351) without any vector reshapes;
  * per-color diffusion values are independent (1, 5B) rows, unrolled in
    Python — never stacked into (4, 5B) arrays.

The banded symbol search (optimize_state.c:183-248) is computed as dense
masked max/max/membership reductions along the TABLE sublane axis over an
extended histogram table (TABLE = 256 + band_pad, hist[t] == hist[t & 0xFF])
so the dynamic band position needs no gather and no dynamic slice.

Integer division by runtime divisors (band modulus, bleed divider) has no
TPU hardware op; it is an f32 reciprocal multiply with two exact integer
corrections (operands < 2^20). The static Sierra divisors 16/8/2 reduce to
shifts on magnitudes; /9 uses the reciprocal helper.

Everything around the kernel (row cost, MSAD self-check, derivative error,
filter selection, strength fallback, scan over rows) stays in XLA — see
pngloss_tpu/ops/optimize_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_FILTERS = 5


def _tdiv_pos(u, div):
    """floor(u / div) for int32 u >= 0 and runtime int32 div > 0, via f32
    reciprocal multiply + two integer corrections (exact for u < 2^20)."""
    q = (u.astype(jnp.float32) * (1.0 / div.astype(jnp.float32))).astype(jnp.int32)
    r = u - q * div
    q = q + (r >= div).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    r = u - q * div
    q = q + (r >= div).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def _tdiv(a, div):
    """C truncating division for signed a, positive runtime div."""
    q = _tdiv_pos(jnp.abs(a), div)
    return jnp.where(a < 0, -q, q)


def _tdiv_shift(a, k: int):
    """C truncating division by the constant 2**k."""
    q = jnp.abs(a) >> k
    return jnp.where(a < 0, -q, q)


def _row_kernel(s_ref, bleed_ref, orig_ref, qprev_ref, e0_ref, e1_ref,
                hist_ref, ofreq_ref, qrow_ref, hist_out_ref, e0n_ref, e1n_ref,
                err0_ref, *, w: int, bpp: int, b: int, table: int):
    """See module docstring. Shapes (L = 5B lanes, filter-major):
      s_ref               : (1, L)       int32  per-lane strength
      bleed_ref           : (1, 1)       int32  (SMEM)
      orig_ref, qprev_ref : (W*bpp, L)   int32  original / quantized prev row
      e0_ref, e1_ref      : (4*(W+5), L) int32  dither rows 0/1 at row start
      hist_ref            : (TABLE, L)   int32  carried adaptive histogram
      ofreq_ref           : (TABLE, L)   int32  original-residual histograms
      qrow_ref            : (W*bpp, L)   int32  out: quantized row
      hist_out_ref        : (TABLE, L)   int32  out: updated histogram
      e0n_ref, e1n_ref    : (4*(W+5), L) int32  out: next row's dither rows
      err0_ref            : (4*(W+5), L) int32  scratch: current dither row 0
    Dither buffers hold column j's 4 color lanes at rows [4j, 4j+4).
    """
    del b  # lane blocking is encoded in s_ref/ofreq_ref contents
    l5 = s_ref.shape[1]
    bleed = bleed_ref[0, 0]
    s = s_ref[:, :]                   # (1, L)
    band = s + 1
    iota_t = lax.broadcasted_iota(jnp.int32, (table, 1), 0)

    # dither rows: row 0 accumulates in scratch; next row's rows 0/1 are the
    # current row's rows 1/2 (the buffer shift of optimize_state.c:344-351
    # is built in): row 1 accumulates into e0n (seeded from e1), row 2 into
    # e1n (seeded with zeros)
    err0_ref[:, :] = e0_ref[:, :]
    e0n_ref[:, :] = e1_ref[:, :]
    e1n_ref[:, :] = jnp.zeros_like(e1n_ref)
    hist_out_ref[:, :] = hist_ref[:, :]

    def body(x, left):
        # left: tuple of bpp (1, L) quantized left-pixel channels
        backs = []
        heres = []
        for c in range(bpp):
            row_i = x * bpp + c
            orig_c = orig_ref[pl.ds(row_i, 1), :]        # (1, L)
            above_c = qprev_ref[pl.ds(row_i, 1), :]
            prev_i = jnp.maximum(row_i - bpp, 0)
            diag_c = jnp.where(x > 0, qprev_ref[pl.ds(prev_i, 1), :], 0)
            left_c = left[c]

            # per-filter predictor via lane-id selection (lanes are
            # filter-major: lane // B == filter id)
            avg = (above_c + left_c) >> 1
            p = above_c - diag_c
            pd = left_c - diag_c
            p_left = jnp.abs(p)
            p_above = jnp.abs(pd)
            p_d = jnp.abs(p + pd)
            paeth = jnp.where(
                (p_left <= p_above) & (p_left <= p_d), left_c,
                jnp.where(p_above <= p_d, above_c, diag_c))
            f_lane = lax.broadcasted_iota(jnp.int32, (1, l5), 1) // (l5 // 5)
            pred = jnp.where(
                f_lane == 1, left_c,
                jnp.where(f_lane == 2, above_c,
                          jnp.where(f_lane == 3, avg,
                                    jnp.where(f_lane == 4, paeth, 0))))

            lane = 3 if (bpp == 2 and c == 1) else c
            ce = err0_ref[pl.ds((x + 2) * 4 + lane, 1), :]
            here_c = orig_c + ce

            osym = orig_c - pred
            predw = pred + jnp.where(osym < -128, -256,
                                     jnp.where(osym > 127, 256, 0))
            osym = orig_c - predw
            filt = here_c - predw

            q = _tdiv_pos(jnp.abs(filt), band)
            mn = jnp.where(filt < 0, -q * band - s, q * band)
            mx = mn + s
            mn = jnp.where(mn + predw < 0, -predw, mn)
            mx = jnp.where(mx + predw > 255, 255 - predw, mx)
            inv = mx < mn
            over = inv & (filt + predw > 255)
            under = inv & (filt + predw < 0)
            mn = jnp.where(over, 255 - predw, jnp.where(under, -predw, mn))
            mx = jnp.where(over, 255 - predw, jnp.where(under, -predw, mx))

            # dense masked lexicographic selection (optimize_state.c:212-248)
            start = mn & 0xFF
            hist = hist_out_ref[:, :]
            ofr = ofreq_ref[:, :]
            inband = (iota_t >= start) & (iota_t <= start + (mx - mn))
            fmax = jnp.max(jnp.where(inband, hist, -1), axis=0, keepdims=True)
            m2 = inband & (hist == fmax)
            omax = jnp.max(jnp.where(m2, ofr, -1), axis=0, keepdims=True)
            m3 = m2 & (ofr == omax)
            idx_orig = start + (osym - mn)
            any_orig = jnp.max(
                jnp.where(m3 & (iota_t == idx_orig), 1, 0), axis=0, keepdims=True)
            idx_min = jnp.min(jnp.where(m3, iota_t, table), axis=0, keepdims=True)
            idx_best = jnp.where(any_orig > 0, idx_orig, idx_min)
            sym_byte = idx_best & 0xFF
            back_c = (idx_best - start) + mn + predw

            if bpp % 2 == 0 and c == bpp - 1:
                # fully transparent pixels stay transparent; the emitted
                # symbol uses the UNwrapped predictor (optimize_state.c:158)
                transp = orig_c == 0
                back_c = jnp.where(transp, 0, back_c)
                here_c = jnp.where(transp, 0, here_c)
                sym_byte = jnp.where(transp, (0 - pred) & 0xFF, sym_byte)

            hist_out_ref[:, :] = hist + ((iota_t & 0xFF) == sym_byte)
            qrow_ref[pl.ds(row_i, 1), :] = back_c
            backs.append(back_c)
            heres.append(here_c)

        # Sierra diffusion (optimize_state.c:390-490), one color lane at a
        # time; the color_delta lane mapping (color_delta.c:9-39) is applied
        # by choosing the channel delta that feeds each lane
        for i in range(4):
            if bpp == 1:
                d = heres[0] - backs[0] if i < 3 else None
            elif bpp == 2:
                d = heres[0] - backs[0] if i < 3 else heres[1] - backs[1]
            elif bpp == 3:
                d = heres[i] - backs[i] if i < 3 else None
            else:
                d = heres[i] - backs[i]
            if d is None:
                continue  # lane diffuses zeros — all updates are no-ops
            d = _tdiv(d, bleed)
            twos = _tdiv_shift(d, 4)
            d = d - twos * 4
            threes = _tdiv_shift(d, 3)
            d = d - threes * 2
            fours = _tdiv(d * 2, jnp.int32(9))
            d = d - fours * 2
            five = _tdiv_shift(d, 1)
            d = d - five

            def rmw(ref, col, val):
                r = col * 4 + i
                ref[pl.ds(r, 1), :] = ref[pl.ds(r, 1), :] + val

            rmw(err0_ref, x + 3, d)        # remainder -> row0 col x+3
            rmw(err0_ref, x + 4, threes)   # row0 col x+4
            rmw(e0n_ref, x + 0, twos)      # row1 cols x..x+4
            rmw(e0n_ref, x + 1, fours)
            rmw(e0n_ref, x + 2, five)
            rmw(e0n_ref, x + 3, fours)
            rmw(e0n_ref, x + 4, twos)
            rmw(e1n_ref, x + 1, twos)      # row2 cols x+1..x+3
            rmw(e1n_ref, x + 2, threes)
            rmw(e1n_ref, x + 3, twos)

        return tuple(backs)

    left0 = tuple(jnp.zeros((1, l5), jnp.int32) for _ in range(bpp))
    lax.fori_loop(0, w, body, left0)


@functools.partial(
    jax.jit, static_argnames=("w", "bpp", "b", "table", "interpret"))
def row_attempt_pallas(s5, bleed, orig5, qprev5, e05, e15, hist5, ofreq5, *,
                       w: int, bpp: int, b: int, table: int,
                       interpret: bool = False):
    """Quantize one row for B images x 5 filters. Every array input is
    pre-tiled to L = 5B filter-major lanes (XLA-side broadcast). Returns
    (qrow (W*bpp,L), hist (TABLE,L), e0n (4(W+5),L), e1n (4(W+5),L))."""
    l5 = NUM_FILTERS * b
    wb = w * bpp
    rows_e = 4 * (w + 5)
    out_shapes = (
        jax.ShapeDtypeStruct((wb, l5), jnp.int32),
        jax.ShapeDtypeStruct((table, l5), jnp.int32),
        jax.ShapeDtypeStruct((rows_e, l5), jnp.int32),
        jax.ShapeDtypeStruct((rows_e, l5), jnp.int32),
    )
    kernel = functools.partial(_row_kernel, w=w, bpp=bpp, b=b, table=table)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem, smem, vmem, vmem, vmem, vmem, vmem, vmem],
        out_specs=(vmem, vmem, vmem, vmem),
        scratch_shapes=[pltpu.VMEM((rows_e, l5), jnp.int32)],
        interpret=interpret,
    )(
        s5.astype(jnp.int32),
        jnp.reshape(bleed.astype(jnp.int32), (1, 1)),
        orig5, qprev5, e05, e15, hist5, ofreq5,
    )
