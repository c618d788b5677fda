"""Pallas TPU kernel for the per-row quantization scan.

One kernel invocation quantizes ONE row of a whole image batch under ALL
five PNG filters simultaneously: the vector lanes are ordered filter-major
as (5, B) -> 5B, so the per-filter predictor needs no dynamic selection —
each filter's formula is applied to its static lane block.

Layout (chosen so every hot op is a dense 2-D VPU sweep, no gathers):
  * per-lane scalars:      (1, 5B) rows
  * dither windows:        (positions*4, 5B) rows carried through the x-loop
  * adaptive histogram:    (TABLE, 5B), TABLE = 256 + band_pad, with the
                           extended-table invariant hist[t] == hist[t & 0xFF]
  * banded symbol search:  masked max/max/membership reductions along the
                           TABLE (sublane) axis — optimize_state.c:183-248
  * per-step memory ops:   single-sublane dynamic reads/writes (pl.ds)

Integer division by runtime divisors (the band modulus and the bleed
divider) has no TPU hardware op; it is computed via f32 reciprocal multiply
with two exact integer corrections (operand magnitudes here are < 2^20, so
one correction already suffices; the second is belt-and-braces). Divisions
by the static Sierra constants 16/8/2 reduce to shifts on magnitudes and
/9 goes through the same reciprocal helper.

Everything else (row cost, adaptive MSAD self-check, derivative error,
filter selection, strength fallback, the scan over rows) stays in XLA —
see pngloss_tpu/ops/optimize.py. The row cost needs no per-symbol gather:
  sum over pixels of ulog2(UINTMAX_MAX / freq[sym])
      == sum over t<256 of (hist_out[t] - hist_in[t]) * (33 + clz(hist_out[t]))
because the histogram increments exactly once per emitted symbol
(optimize_state.c:251-254) and the emitted byte equals the cost-loop's
recomputed byte (the ±256 predictor wrap vanishes mod 256).
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


def _cd_rows(d, bpp: int):
    """color_difference lane mapping (color_delta.c:9-39) on (bpp, L) rows
    -> (4, L) rows."""
    z = jnp.zeros_like(d[0:1])
    if bpp == 1:
        g = d[0:1]
        return jnp.concatenate([g, g, g, z])
    if bpp == 2:
        g = d[0:1]
        return jnp.concatenate([g, g, g, d[1:2]])
    if bpp == 3:
        return jnp.concatenate([d, z])
    return d


def _row_kernel(s_ref, bleed_ref, orig_ref, qprev_ref, e0_ref, e1_ref,
                hist_ref, ofreq_ref, qrow_ref, hist_out_ref, e0n_ref, e1n_ref,
                *, w: int, bpp: int, b: int, table: int):
    """See module docstring. Shapes:
      orig_ref, qprev_ref : (W*bpp, B)   int32  original / quantized prev row
      e0_ref, e1_ref      : (4*(W+5), B) int32  dither rows 0/1 at row start
      hist_ref            : (TABLE, B)   int32  carried adaptive histogram
      ofreq_ref           : (TABLE, 5B)  int32  original-residual histograms
      qrow_ref            : (W*bpp, 5B)  int32  quantized row per filter
      hist_out_ref        : (TABLE, 5B)  int32  updated histogram per filter
      e0n_ref, e1n_ref    : (4*(W+5), 5B) int32 next row's dither rows 0/1
    """
    l5 = 5 * b
    bleed = bleed_ref[0, 0]
    iota_t = lax.broadcasted_iota(jnp.int32, (table, 1), 0)

    def tile5(v):  # (k, B) -> (k, 5B), filter-major
        return jnp.tile(v, (1, NUM_FILTERS))

    # strength is per image: the fallback retry (pngloss_image.c:266-275)
    # lowers it independently per batch element
    s = tile5(s_ref[:, :])            # (1, 5B)
    band = s + 1

    # seed the per-filter histograms from the shared carried histogram
    hist_out_ref[:, :] = tile5(hist_ref[:, :])
    # e1n rows outside the written range stay zero (dither row 2 column 0 is
    # never written; columns W+4 likewise — optimize_state.c write offsets)
    zeros4 = jnp.zeros((4, l5), jnp.int32)
    e1n_ref[0:4, :] = zeros4
    e1n_ref[pl.ds(4 * (w + 4), 4), :] = zeros4

    def body(x, carry):
        left, win0, win1, win2 = carry
        # left: (bpp, 5B); win0/win2: (12, 5B); win1: (20, 5B)
        backs = []
        heres = []
        for c in range(bpp):
            row_i = x * bpp + c
            orig_c = orig_ref[pl.ds(row_i, 1), :]        # (1, B)
            above_c = qprev_ref[pl.ds(row_i, 1), :]
            prev_i = jnp.maximum(row_i - bpp, 0)
            diag_c = jnp.where(x > 0, qprev_ref[pl.ds(prev_i, 1), :], 0)

            # per-filter predictors on static lane blocks (f-major order)
            lf = lambda f: left[c:c + 1, f * b:(f + 1) * b]
            avg = (above_c + lf(3)) >> 1
            p = above_c - diag_c
            pd = lf(4) - diag_c
            p_left = jnp.abs(p)
            p_above = jnp.abs(pd)
            p_d = jnp.abs(p + pd)
            paeth = jnp.where(
                (p_left <= p_above) & (p_left <= p_d), lf(4),
                jnp.where(p_above <= p_d, above_c, diag_c))
            pred = jnp.concatenate(
                [jnp.zeros_like(orig_c), lf(1), above_c, avg, paeth], axis=1)

            orig5 = tile5(orig_c)                        # (1, 5B)
            lane = 3 if (bpp == 2 and c == 1) else c
            ce = win0[lane:lane + 1, :]                   # dither at x+2
            here_c = orig5 + ce

            osym = orig5 - pred
            predw = pred + jnp.where(osym < -128, -256,
                                     jnp.where(osym > 127, 256, 0))
            osym = orig5 - predw
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
                transp = tile5(orig_ref[pl.ds(x * bpp + bpp - 1, 1), :] == 0)
                back_c = jnp.where(transp, 0, back_c)
                here_c = jnp.where(transp, 0, here_c)
                sym_byte = jnp.where(transp, (0 - pred) & 0xFF, sym_byte)

            hist_out_ref[:, :] = hist + ((iota_t & 0xFF) == sym_byte)
            backs.append(back_c)
            heres.append(here_c)

        back = jnp.concatenate(backs, axis=0)            # (bpp, 5B)
        here = jnp.concatenate(heres, axis=0)
        qrow_ref[pl.ds(x * bpp, bpp), :] = back

        # Sierra diffusion (optimize_state.c:390-490)
        d = _tdiv(_cd_rows(here - back, bpp), bleed)     # (4, 5B)
        twos = _tdiv_shift(d, 4)
        d = d - twos * 4
        threes = _tdiv_shift(d, 3)
        d = d - threes * 2
        fours = _tdiv(d * 2, jnp.int32(9))
        d = d - fours * 2
        five = _tdiv_shift(d, 1)
        d = d - five

        z4 = jnp.zeros_like(d)
        win0 = win0 + jnp.concatenate([z4, d, threes])          # x+2,x+3,x+4
        win1 = win1 + jnp.concatenate([twos, fours, five, fours, twos])
        win2 = win2 + jnp.concatenate([twos, threes, twos])      # x+1..x+3

        e0n_ref[pl.ds(x * 4, 4), :] = win1[0:4]       # column x finalized
        e1n_ref[pl.ds((x + 1) * 4, 4), :] = win2[0:4]  # column x+1 finalized

        e0in = tile5(e0_ref[pl.ds((x + 5) * 4, 4), :])
        e1in = tile5(e1_ref[pl.ds((x + 5) * 4, 4), :])
        win0 = jnp.concatenate([win0[4:12], e0in])
        win1 = jnp.concatenate([win1[4:20], e1in])
        win2 = jnp.concatenate([win2[4:12], z4])
        return back, win0, win1, win2

    carry0 = (
        jnp.zeros((bpp, l5), jnp.int32),
        tile5(e0_ref[8:20, :]),      # err0 columns x+2..x+4 at x=0
        tile5(e1_ref[0:20, :]),      # err1 columns x..x+4 at x=0
        jnp.zeros((12, l5), jnp.int32),
    )
    _, win0_f, win1_f, win2_f = lax.fori_loop(0, w, body, carry0)
    del win0_f
    e0n_ref[pl.ds(4 * w, 20), :] = win1_f            # columns W..W+4
    e1n_ref[pl.ds(4 * (w + 1), 12), :] = win2_f      # columns W+1..W+3


@functools.partial(
    jax.jit, static_argnames=("w", "bpp", "b", "table", "interpret"))
def row_attempt_pallas(s, bleed, orig_t, qprev_t, e0, e1, hist, ofreq5, *,
                       w: int, bpp: int, b: int, table: int,
                       interpret: bool = False):
    """Quantize one row for B images x 5 filters. All layouts as in
    _row_kernel; s is a per-image (1, B) int32 strength vector, bleed an
    int32 scalar. Returns
    (qrow (W*bpp,5B), hist (TABLE,5B), e0n (4(W+5),5B), e1n (4(W+5),5B))."""
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
        interpret=interpret,
    )(
        jnp.reshape(s.astype(jnp.int32), (1, b)),
        jnp.reshape(bleed.astype(jnp.int32), (1, 1)),
        orig_t, qprev_t, e0, e1, hist, ofreq5,
    )
