"""Pallas TPU kernel for the per-row quantization scan.

One kernel invocation quantizes ONE row of a whole image batch under ALL
five PNG filters simultaneously: the vector lanes are ordered filter-major
as (5, B) -> L = 5B, so each lane carries one (filter, image) pair.

Layout: everything indexed by pixel/column uses an 8-SUBLANE STRIDE —
pixel x's channels live at rows [8x, 8x+bpp) of an (8W, L) buffer, dither
column j's 4 color lanes at rows [8j, 8j+4) of an (8(W+5), L) buffer. The
stride-8 padding is what makes every per-step memory access a SINGLE
aligned multi-row op (Mosaic requires dynamic multi-row starts to be
provably 8-aligned, and per-(row,lane) single-row ops dominate the step
cost otherwise): per pixel there are exactly 7 dynamic VMEM ops — 3 block
reads (original pixel, previous-row pixel, dither column), 1 block write
(quantized pixel) and 3 grouped read-modify-writes (one per Sierra dither
row). All row composition uses row-index-iota `where` selects
(concatenate/scatter/.at are not Mosaic-lowerable here).

The banded symbol search (optimize_state.c:183-248) runs as dense masked
max/min reductions along the TABLE sublane axis over the MODULAR 256-row
histogram table: u = (t - start) mod 256 linearizes the band in offset
space (min-u is the C scan-order tie-break), so the dynamic band position
needs no gather, no dynamic slice, and no extended rows — in packed mode
the two levels + orig-preference fold into one max + one min over packed
keys; in non-packed mode (big images past the packed-key range) freq and
ofreq are compared as separate max levels.

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
STRIDE = 8  # sublane stride per pixel/column (alignment unit)


def _tdiv_pos(u, div, rdiv=None, corrections: int = 2):
    """floor(u / div) for int32 u >= 0 and runtime int32 div > 0, via f32
    reciprocal multiply + integer corrections.  rdiv, when given, is
    the precomputed f32 ``1.0 / div`` (loop-invariant hoisting: Mosaic
    does not reliably hoist the reciprocal out of a fori_loop body); it
    must be exactly the value this function would compute, so exactness
    analysis below is unchanged.

    Exactness domain (corrections=2): u < 2^20, with margin. The raw
    estimate is q0 = trunc(f32(u) * f32(1/div)); with IEEE
    round-to-nearest the reciprocal and the product carry <= 2^-24
    relative error each, so the quotient error is <= (u/div)*2^-23 + 1
    units, and each correction step repairs one unit — two corrections
    are exact while (u/div)*2^-23 < 2, i.e. u < 2^24 under IEEE semantics
    (tests/test_pallas_kernel.py sweeps the boundary). The TPU VPU's f32
    reciprocal is an approximation instruction not guaranteed correctly
    rounded, so only u < 2^20 is claimed (16x margin even if the hardware
    reciprocal loses 4 bits vs IEEE; on-chip byte-parity suites pin it).

    corrections=1 (the in-kernel fast path): exact while the pre-trunc
    absolute error (u/div)*eps_total < 1 — under the same conservative
    4-bit-lossy-reciprocal assumption (eps ~ 2^-20), u < 2^16 keeps a
    16x margin (the IEEE boundary is u < 2^23, also swept by the test).
    Callers may use it only when operands are provably < 2^16.

    Callers keep operands inside the domains: every operand is bounded
    by |dither error| + 766, and the dither error is bounded by 255 for
    any bleed >= 2 (each truncating Sierra split conserves magnitude and
    the per-cell in-edge weights sum to 1, so E' <= (E + 255)/bleed has
    fixed point 255) — so bleed >= 2 always qualifies for one
    correction. At bleed == 1 the error can grow by up to ~255 per
    dependency hop (one row down, or 3 columns right within a row):
    optimize_batch_pallas keeps two corrections once an image has more
    than 250 hops (255*250 + 766 < 2^16) and routes batches with enough
    hops to threaten 2^20 to the pure-XLA path (native int32 division,
    exact for all int32)."""
    if rdiv is None:
        rdiv = 1.0 / div.astype(jnp.float32)
    q = (u.astype(jnp.float32) * rdiv).astype(jnp.int32)
    for _ in range(corrections):
        r = u - q * div
        q = q + (r >= div).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def _tdiv(a, div, rdiv=None, corrections: int = 2):
    """C truncating division for signed a, positive runtime div."""
    q = _tdiv_pos(jnp.abs(a), div, rdiv, corrections)
    return jnp.where(a < 0, -q, q)


def _tdiv_shift(a, k: int):
    """C truncating division by the constant 2**k."""
    q = jnp.abs(a) >> k
    return jnp.where(a < 0, -q, q)


def _sierra_splits(dl, bleed, rbleed, r9, corrections: int = 2):
    """The Sierra-lite split chain (optimize_state.c:390-490): returns
    (twos, threes, fours, five, rem) — C-truncating-division exact.

    Computed on MAGNITUDES with one sign restore per output: every stage
    is a truncating division or a remainder subtraction with positive
    coefficients, both of which commute with negation (each unsigned
    remainder stays >= 0), so the unsigned chain's values equal the
    magnitudes of the signed chain's and every output carries dl's sign.
    This replaces the per-stage abs/sign-select pairs inside _tdiv /
    _tdiv_shift (2 + 3 of them) with one abs and five final selects, and
    feeds the /9 division a nonnegative operand directly.  The round-5
    ablation pinned this chain (skel_nosierramath) at ~0.018 s/chunk —
    the second-largest kernel term — which is why it gets hand-tuning."""
    neg = dl < 0
    du = _tdiv_pos(jnp.abs(dl), bleed, rbleed, corrections)
    twos_u = du >> 4
    du = du - (twos_u << 2)
    threes_u = du >> 3
    du = du - (threes_u << 1)
    fours_u = _tdiv_pos(du << 1, jnp.int32(9), r9, corrections)
    du = du - (fours_u << 1)
    five_u = du >> 1
    rem_u = du - five_u
    return tuple(jnp.where(neg, -v, v)
                 for v in (twos_u, threes_u, fours_u, five_u, rem_u))


def _rot_rows(wmax: int) -> int:
    """Rows of the rotated window table for a max band width wmax: valid
    rows [0, wmax] must survive the three sub-vreg roll stages (which
    consume up to 4+2+1 rows of tail validity), 8-aligned."""
    return -(-(wmax + 9) // 8) * 8


def _rotated_window(hist, start, wmax: int, rows: int = 256):
    """Per-lane barrel rotation: returns a (_rot_rows(wmax), L) table whose
    row u holds hist[(start + u) & 0xFF] (valid for u <= wmax).

    The VPU has no per-lane dynamic gather, so the banded symbol window
    cannot be sliced out of the 256-row table directly — but a rotation by
    a per-lane amount decomposes into 8 CONDITIONAL static shifts (one per
    bit of `start`), and after the bit-7 stage the remaining rotation is
    bounded, so each later stage operates on a progressively TRUNCATED
    array: 256 -> 120+n3 -> 56+n3 -> 24+n3 -> 8+n3 -> n3 rows (n3 ~ wmax+9).
    Stages for bits >= 3 are 8-aligned static slices (free) + one select;
    bits 2..0 are static sub-vreg rolls + selects on the final small array.
    Total sweep work is ~(wmax+9)/256 of the dense path's for the
    selection reductions, plus the ~4 dense-row-equivalents paid here.

    rows=128 is an ABLATION-ONLY mode (wrong results: windows crossing
    row 128 wrap early): it drops the leading bit-7 stage, removing the
    same dense-stage vreg traffic an exact int16 base+delta split of the
    table would save — Mosaic cannot measure that split directly (no
    16-bit rotate: `tpu.dynamic_rotate` is 32-bit only)."""
    n3 = _rot_rows(wmax)
    n4, n5, n6, n7 = n3 + 8, n3 + 24, n3 + 56, n3 + 120

    def bit(k):
        return (start >> k) & 1

    if rows == 256:
        x = jnp.where(bit(7) > 0,
                      pltpu.roll(hist, 256 - 128, axis=0), hist)[:n7]
        x = jnp.where(bit(6) > 0, x[64:64 + n6], x[:n6])
    else:
        assert rows == 128
        # truncated-table mode starts at the bit-6 stage: its slice needs
        # n6 = _rot_rows(wmax) + 56 valid rows, so wmax must stay small
        # enough (<= 63) — guard here so a hand-edited ablation spec fails
        # loudly instead of via numpy slice-clamping shape errors
        assert n6 <= rows, f"rows=128 rotation needs wmax <= 63, got {wmax}"
        x = jnp.where(bit(6) > 0,
                      pltpu.roll(hist, 128 - 64, axis=0), hist)[:n6]
    x = jnp.where(bit(5) > 0, x[32:32 + n5], x[:n5])
    x = jnp.where(bit(4) > 0, x[16:16 + n4], x[:n4])
    x = jnp.where(bit(3) > 0, x[8:8 + n3], x[:n3])
    for k in (2, 1, 0):
        # circular roll: rows wrapped from the top are garbage, but they
        # land at indices > wmax, which the width mask never selects
        x = jnp.where(bit(k) > 0, pltpu.roll(x, n3 - (1 << k), axis=0), x)
    return x



def _row_kernel(s_ref, bleed_ref, wr_ref, orig_ref, qprev_ref, e0_ref, e1_ref,
                hist_ref, ofreq_ref, qrow_ref, hist_out_ref, e0n_ref, e1n_ref,
                *, w: int, bpp: int, b: int, table: int,
                packed: bool = False, wmax: int = 0,
                fast_div: bool = False):
    """See module docstring. Shapes (L = 5B lanes, filter-major; S = 8):
      s_ref               : (1, L)        int32  per-lane strength
      bleed_ref           : (1, 1)        int32  (SMEM)
      wr_ref              : (1, L)        int32  per-lane real width (ragged
                            batching: pixels x >= wr neither count in the
                            histogram nor diffuse error — their diffusion
                            would reach REAL columns of the next row)
      orig_ref, qprev_ref : (S*W, L)      int32  original / quantized prev row
      e0_ref, e1_ref      : (S*(W+5), L)  int32  dither rows 0/1 at row start
      hist_ref            : (TABLE, L)    int32  carried adaptive histogram
      ofreq_ref           : (TABLE, L)    int32  original-residual histograms
      qrow_ref            : (S*W, L)      int32  out: quantized row
      hist_out_ref        : (TABLE, L)    int32  out: updated histogram
      e0n_ref, e1n_ref    : (S*(W+5), L)  int32  out: next row's dither rows

    The Sierra error window rides in loop REGISTERS: step x's diffusion
    lands at columns x..x+4, consumed within 4 steps, so a sliding
    register window finalizes each error column with one memory op (the
    adds happen in the same order, so committed values are bit-identical).
    The current dither row never touches memory at all — its only reader
    is the carried-error fetch, which reads the e0 INPUT plus the pending
    registers — and the next rows' outputs seed from e1 / zero at
    finalize time, replacing the old row-start full-buffer copies.
    """
    del b  # lane blocking is encoded in s_ref/ofreq_ref contents
    l5 = s_ref.shape[1]
    # one correction step in the reciprocal-multiply divisions when the
    # caller proved the operand domain < 2^16 (see _tdiv_pos)
    ndiv = 1 if fast_div else 2
    bleed = bleed_ref[0, 0]
    s = s_ref[:, :]                   # (1, L)
    band = s + 1
    # loop-invariant reciprocals for the in-scan truncating divisions
    # (identical expressions to what _tdiv would compute per step)
    rband = 1.0 / band.astype(jnp.float32)
    rbleed = 1.0 / bleed.astype(jnp.float32)
    r9 = 1.0 / jnp.float32(9)
    iota_t = lax.broadcasted_iota(jnp.int32, (table, 1), 0)
    f_lane = lax.broadcasted_iota(jnp.int32, (1, l5), 1) // (l5 // 5)

    # next row's dither rows 0/1 are the current row's rows 1/2 (the
    # buffer shift of optimize_state.c:344-351 is built in): e0n seeds
    # from e1 and e1n from zero — both applied column-by-column at
    # register-window finalize time below, not via full-buffer copies
    hist_out_ref[:, :] = hist_ref[:, :]

    def compose(vals, rows_n):
        """vals: 4 per-color-lane (1, L) rows (or None = zero); build a
        (rows_n, L) block whose row r carries vals[r % 8] (rows 4..7 of
        each 8-row column block are zero padding)."""
        ri = lax.broadcasted_iota(jnp.int32, (rows_n, l5), 0) & 7
        if (vals[0] is not None and vals[0] is vals[1] and vals[1] is vals[2]):
            tail = jnp.zeros((rows_n, l5), jnp.int32)
            if vals[3] is not None:
                tail = jnp.where(ri == 3, vals[3], tail)
            return jnp.where(ri <= 2, vals[0], tail)
        out = jnp.zeros((rows_n, l5), jnp.int32)
        for i in range(4):
            if vals[i] is not None:
                out = jnp.where(ri == i, vals[i], out)
        return out

    def body(x, carry):
        left, prev_above, pr_a, pr_b, pn1, pn2, pn3, pn4, pm2, pm3 = carry
        # left: tuple of bpp (1, L) quantized left-pixel channels;
        # prev_above: (S, L) previous pixel of the quantized previous row
        # (the diagonal neighbor — carried to avoid a fourth block read);
        # pr_*/pn*/pm*: the register-window pendings for the current /
        # next / after-next dither rows (module docstring; the p prefix
        # keeps them clear of the selection masks m1/m2/m3 below)
        cmask = (x < wr_ref[:, :]).astype(jnp.int32)        # (1, L)
        orig_px = orig_ref[pl.ds(pl.multiple_of(x * STRIDE, 8), STRIDE), :]
        above_px = qprev_ref[pl.ds(pl.multiple_of(x * STRIDE, 8), STRIDE), :]
        # carried error = the seeded input row plus the pending
        # in-register contributions from the last two steps
        ce_px = e0_ref[pl.ds(pl.multiple_of((x + 2) * STRIDE, 8), STRIDE),
                       :] + pr_a

        backs = []
        heres = []
        hist = hist_out_ref[:, :]     # one table read per pixel
        pend_syms = []                # deferred one-hots (wmax path)
        upd = 256 if packed else 1
        for c in range(bpp):
            orig_c = orig_px[c:c + 1, :]                       # (1, L)
            above_c = above_px[c:c + 1, :]
            diag_c = prev_above[c:c + 1, :]
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
            pred = jnp.where(
                f_lane == 1, left_c,
                jnp.where(f_lane == 2, above_c,
                          jnp.where(f_lane == 3, avg,
                                    jnp.where(f_lane == 4, paeth, 0))))

            lane = 3 if (bpp == 2 and c == 1) else c
            ce = ce_px[lane:lane + 1, :]
            here_c = orig_c + ce

            osym = orig_c - pred
            predw = pred + jnp.where(osym < -128, -256,
                                     jnp.where(osym > 127, 256, 0))
            osym = orig_c - predw
            filt = here_c - predw

            q = _tdiv_pos(jnp.abs(filt), band, rband, ndiv)
            mn = jnp.where(filt < 0, -q * band - s, q * band)
            mx = mn + s
            mn = jnp.where(mn + predw < 0, -predw, mn)
            mx = jnp.where(mx + predw > 255, 255 - predw, mx)
            inv = mx < mn
            over = inv & (filt + predw > 255)
            under = inv & (filt + predw < 0)
            mn = jnp.where(over, 255 - predw, jnp.where(under, -predw, mn))
            mx = jnp.where(over, 255 - predw, jnp.where(under, -predw, mx))

            # masked lexicographic selection (optimize_state.c:212-248)
            # over the MODULAR window u = (t - start) mod 256; with wmax
            # set, the barrel rotation shrinks the swept rows to ~wmax+9
            # and the dense histogram update defers to the pixel end (the
            # stale table + pending in-window one-hots is exact; see
            # pallas_image.py for the rationale)
            start = mn & 0xFF
            width = mx - mn                        # <= 255 after clamping
            u_orig = osym - mn                     # in [0, width] iff orig
            if wmax:
                uu = lax.broadcasted_iota(
                    jnp.int32, (_rot_rows(wmax), 1), 0)
                hist_w = _rotated_window(hist, start, wmax)
                for ps in pend_syms:
                    hist_w = hist_w + jnp.where(
                        uu == ((ps - start) & 0xFF), upd * cmask, 0)
            else:
                uu = (iota_t - start) & 0xFF
                hist_w = hist
            m1 = uu <= width
            if packed:
                # hist holds the PACKED key freq*256 + rank(ofreq): one
                # max-reduce replaces the two-level (freq, ofreq) compare,
                # and remapping the original symbol's offset to -1 folds
                # the third tie-break into the min-reduce — 2 reductions
                # per channel instead of 4. Valid while freq < 2^23
                # (checked by the caller).
                masked = jnp.where(m1, hist_w, -1)
                kmax = jnp.max(masked, axis=0, keepdims=True)
                m3 = masked == kmax
            else:
                # big images whose freq counts exceed the packed-key
                # range: freq and ofreq compared as separate max levels
                ofr_w = (_rotated_window(ofreq_ref[:, :], start, wmax)
                         if wmax else ofreq_ref[:, :])
                fmax = jnp.max(jnp.where(m1, hist_w, -1),
                               axis=0, keepdims=True)
                m2 = m1 & (hist_w == fmax)
                omax = jnp.max(jnp.where(m2, ofr_w, -1),
                               axis=0, keepdims=True)
                m3 = m2 & (ofr_w == omax)
            u_adj = jnp.where(uu == u_orig, -1, uu)
            sel = jnp.min(jnp.where(m3, u_adj, 256),
                          axis=0, keepdims=True)
            u_best = jnp.where(sel < 0, u_orig, sel)
            sym_byte = (start + u_best) & 0xFF
            back_c = u_best + mn + predw

            if bpp % 2 == 0 and c == bpp - 1:
                # fully transparent pixels stay transparent; the emitted
                # symbol uses the UNwrapped predictor (optimize_state.c:158)
                transp = orig_c == 0
                back_c = jnp.where(transp, 0, back_c)
                here_c = jnp.where(transp, 0, here_c)
                sym_byte = jnp.where(transp, (0 - pred) & 0xFF, sym_byte)

            # modular table: exactly one row matches (table == 256)
            if wmax:
                pend_syms.append(sym_byte)
            else:
                hist = hist + ((iota_t == sym_byte) * cmask) * upd
                hist_out_ref[:, :] = hist
            backs.append(back_c)
            heres.append(here_c)

        if pend_syms:
            inc = (iota_t == pend_syms[0]).astype(jnp.int32)
            for ps in pend_syms[1:]:
                inc = inc + (iota_t == ps)
            hist_out_ref[:, :] = hist + (inc * cmask) * upd

        # one aligned block store per pixel: channel c at row c, rest zero
        ri8 = lax.broadcasted_iota(jnp.int32, (STRIDE, l5), 0)
        back_px = jnp.zeros((STRIDE, l5), jnp.int32)
        for c in range(bpp):
            back_px = jnp.where(ri8 == c, backs[c], back_px)
        qrow_ref[pl.ds(pl.multiple_of(x * STRIDE, 8), STRIDE), :] = back_px

        # Sierra diffusion (optimize_state.c:390-490) with the color_delta
        # lane mapping (color_delta.c:9-39); ONE grouped read-modify-write
        # per dither row
        lanes = {1: [0, 0, 0, None], 2: [0, 0, 0, 1],
                 3: [0, 1, 2, None], 4: [0, 1, 2, 3]}[bpp]
        diffs = [(heres[c] - backs[c]) * cmask for c in range(bpp)]
        twos_l, threes_l, fours_l, five_l, rem_l = ([None] * 4 for _ in range(5))
        cache = {}
        for i in range(4):
            c = lanes[i]
            if c is None:
                continue
            if c not in cache:
                cache[c] = _sierra_splits(diffs[c], bleed, rbleed, r9, ndiv)
            twos_l[i], threes_l[i], fours_l[i], five_l[i], rem_l[i] = cache[c]

        twos8 = compose(twos_l, STRIDE)
        threes8 = compose(threes_l, STRIDE)
        fours8 = compose(fours_l, STRIDE)
        five8 = compose(five_l, STRIDE)
        rem8 = compose(rem_l, STRIDE)

        # slide the register error windows (module docstring): the
        # current dither row's cols x+3/x+4 stay in registers (row0 is
        # never written — only the ce fetch reads it); the next row's
        # col x finalizes as e1-seed + pendings, the after-next row's
        # col x+1 as a pure write (zero seed)
        colx = pl.ds(pl.multiple_of(x * STRIDE, 8), STRIDE)
        e0n_ref[colx, :] = e1_ref[colx, :] + (pn1 + twos8)
        pn1, pn2, pn3, pn4 = pn2 + fours8, pn3 + five8, pn4 + fours8, twos8
        colx1 = pl.ds(pl.multiple_of((x + 1) * STRIDE, 8), STRIDE)
        e1n_ref[colx1, :] = pm2 + twos8
        pm2, pm3 = pm3 + threes8, twos8
        pr_a, pr_b = pr_b + rem8, threes8

        return (tuple(backs), above_px, pr_a, pr_b,
                pn1, pn2, pn3, pn4, pm2, pm3)

    left0 = tuple(jnp.zeros((1, l5), jnp.int32) for _ in range(bpp))
    z8 = jnp.zeros((STRIDE, l5), jnp.int32)
    (_, _, pr_a, pr_b, pn1, pn2, pn3, pn4, pm2, pm3) = lax.fori_loop(
        0, w, body, (left0, z8, z8, z8, z8, z8, z8, z8, z8, z8))

    # flush the register windows: e0n pendings map to cols w..w+3, col
    # w+4 is pure seed; e1n pendings to cols w+1/w+2, and its cols 0 /
    # w+3 / w+4 are never written in-loop and must read zero
    for i, reg in enumerate((pn1, pn2, pn3, pn4)):
        cf = pl.ds((w + i) * STRIDE, STRIDE)
        e0n_ref[cf, :] = e1_ref[cf, :] + reg
    cf = pl.ds((w + 4) * STRIDE, STRIDE)
    e0n_ref[cf, :] = e1_ref[cf, :]
    e1n_ref[pl.ds((w + 1) * STRIDE, STRIDE), :] = pm2
    e1n_ref[pl.ds((w + 2) * STRIDE, STRIDE), :] = pm3
    e1n_ref[pl.ds(0, STRIDE), :] = z8
    e1n_ref[pl.ds((w + 3) * STRIDE, 2 * STRIDE), :] = jnp.zeros(
        (2 * STRIDE, l5), jnp.int32)


@functools.partial(
    jax.jit, static_argnames=(
        "w", "bpp", "b", "table", "interpret", "packed", "wmax",
        "fast_div"))
def row_attempt_pallas(s5, bleed, orig8, qprev8, e08, e18, hist5, ofreq5,
                       wr5=None, *, w: int, bpp: int, b: int, table: int,
                       interpret: bool = False, packed: bool = False,
                       wmax: int = 0, fast_div: bool = False):
    """Quantize one row for B images x 5 filters. Array inputs are pre-tiled
    to L = 5B filter-major lanes and pixel/column-indexed arrays use the
    8-sublane stride layout. In packed mode hist5 carries freq*256+rank
    packed keys (ofreq5 is then unused by the kernel). wr5: optional (1, L)
    per-lane real widths of padded rows (ragged batching). Returns
    (qrow (8W,L), hist (TABLE,L), e0n (8(W+5),L), e1n (8(W+5),L))."""
    l5 = NUM_FILTERS * b
    rows_px = STRIDE * w
    rows_e = STRIDE * (w + 5)
    if wr5 is None:
        wr5 = jnp.full((1, l5), w, jnp.int32)
    out_shapes = (
        jax.ShapeDtypeStruct((rows_px, l5), jnp.int32),
        jax.ShapeDtypeStruct((table, l5), jnp.int32),
        jax.ShapeDtypeStruct((rows_e, l5), jnp.int32),
        jax.ShapeDtypeStruct((rows_e, l5), jnp.int32),
    )
    kernel = functools.partial(_row_kernel, w=w, bpp=bpp, b=b, table=table,
                               packed=packed, wmax=wmax, fast_div=fast_div)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # operand footprint (everything int32, 5B lanes): 3 pixel buffers,
    # 4 dither buffers, 3 histogram tables — plus slack for temporaries
    vmem_bytes = 4 * (3 * rows_px + 4 * rows_e + 3 * table) * l5
    vmem_bytes = min(int(vmem_bytes * 1.5) + (2 << 20), 128 << 20)
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[vmem, smem, vmem, vmem, vmem, vmem, vmem, vmem, vmem],
        out_specs=(vmem, vmem, vmem, vmem),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(
        s5.astype(jnp.int32),
        jnp.reshape(bleed.astype(jnp.int32), (1, 1)),
        wr5.astype(jnp.int32),
        orig8, qprev8, e08, e18, hist5, ofreq5,
    )
