"""Batch-layout optimizer driving the Pallas row kernel.

The whole image batch lives in "transposed" layout (rows x batch-lanes):
  * original / quantized rows:  (H, W*bpp, B) int32
  * dither rows:                (4*(W+5), B) int32
  * adaptive histogram:         (TABLE, B) int32
  * per-filter results:         (..., 5B) lanes, filter-major

Each scan-over-rows step calls the Pallas kernel (pallas_row.py) once per
strength attempt; everything around it is dense XLA with NO gathers:
  * row cost: sum over t<256 of (hist_out - hist_in) * (33 + clz(hist_out))
    — exact identity for sum(ulog2(UINTMAX_MAX / freq[sym])) because the
    histogram increments once per emitted symbol (optimize_state.c:251-254)
  * derivative error (optimize_state.c:265-289) as a vectorized row op with
    the exact uintmax/128 split-sum
  * libpng MSAD self-check (optimize_state.c:492-562) vectorized over all
    5 candidate rows x 5 trial filters, gated by lax.cond on adaptive rows
  * per-image strength fallback (pngloss_image.c:266-275) as a while_loop
    with a per-image strength vector and found mask

Bit-exact vs pngloss_tpu.core.reference (and therefore vs the C tool).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from pngloss_tpu.ops.optimize import band_pad_for
from pngloss_tpu.ops.pallas_row import STRIDE, row_attempt_pallas

NUM_FILTERS = 5
_I32_MAX = (1 << 31) - 1

# packed-key selection (key = freq*256 + rank, rank < 256) is exact while
# the key fits int32: freq <= 2^23 - 1 gives key <= (2^23-1)*256 + 255 =
# INT32_MAX exactly. freq is bounded by the image's channel-sample count
# h*w*bpp (one histogram increment per emitted channel symbol), and the
# MXU one-hot original-frequency pre-pass is exact while counts < 2^24 —
# so packed mode serves every image below 2^23 channel samples.
PACKED_KEY_MAX_SAMPLES = 1 << 23


def _to_stride8(a_t, w: int, bpp: int):
    """(W*bpp, B) -> (8W, B): pixel x's channels at rows [8x, 8x+bpp)."""
    n = a_t.shape[1]
    x = a_t.reshape(w, bpp, n)
    x = jnp.pad(x, ((0, 0), (0, STRIDE - bpp), (0, 0)))
    return x.reshape(STRIDE * w, n)


def _from_stride8(a8, w: int, bpp: int):
    """(8W, L) -> (W*bpp, L)."""
    n = a8.shape[1]
    return a8.reshape(w, STRIDE, n)[:, :bpp].reshape(w * bpp, n)


def _shift_rows(a, k: int):
    """Shift (R, ...) down by k rows, zero-filled (left-neighbor shift)."""
    return jnp.concatenate([jnp.zeros_like(a[:k]), a[:-k]], axis=0)


def _tile5(v):
    return jnp.tile(v, (1, NUM_FILTERS))


def _pred_trial(t: int, above, diag, left):
    """Static-filter predictor on row-major arrays."""
    if t == 0:
        return jnp.zeros_like(above)
    if t == 1:
        return left
    if t == 2:
        return above
    if t == 3:
        return (above + left) // 2
    p = above - diag
    pd = left - diag
    return jnp.where(
        (jnp.abs(p) <= jnp.abs(pd)) & (jnp.abs(p) <= jnp.abs(p + pd)),
        left, jnp.where(jnp.abs(pd) <= jnp.abs(p + pd), above, diag))


def _msad_valid(qrow5, qprev_t, bpp: int, b: int, col_mask5=None):
    """Does each filter's candidate row pass the libpng-heuristic
    self-consistency check? col_mask5 (W*bpp, 5B) excludes padded columns.
    Returns (5, B) bool."""
    above5 = _tile5(qprev_t)
    left5 = _shift_rows(qrow5, bpp)
    diag5 = _tile5(_shift_rows(qprev_t, bpp))
    sums = []
    for t in range(NUM_FILTERS):
        v = (qrow5 - _pred_trial(t, above5, diag5, left5)) & 0xFF
        v = jnp.where(v < 128, v, 256 - v)
        if col_mask5 is not None:
            v = v * col_mask5
        sums.append(jnp.sum(v, axis=0))
    sums = jnp.stack(sums)                      # (5 trials, 5B)
    chosen = jnp.argmin(sums, axis=0)           # first minimum, like the
    # C >= cascade resolving ties to the earliest filter
    chosen = chosen.reshape(NUM_FILTERS, b)
    f_ids = jnp.arange(NUM_FILTERS, dtype=chosen.dtype)[:, None]
    return chosen == f_ids


def _deriv_error_div128(qrow5, qprev_t, orow_t, oprev_t, bpp: int, b: int,
                        w: int, px_mask5=None):
    """(5, B) int32: per-filter row derivative error // 128, exact.
    px_mask5 (W, 5B) excludes padded columns (ragged batching)."""
    # channel weights from the color_delta lane mapping (color_delta.c:9-39)
    if bpp == 1:
        cw = [3]
    elif bpp == 2:
        cw = [3, 1]
    else:
        cw = [1] * bpp
    wvec = jnp.asarray(cw * w, jnp.int32)[:, None]   # (W*bpp, 1)

    def dist(new_pair5, old_pair5):
        dn = qrow5 - new_pair5
        do = _tile5(orow_t) - old_pair5
        d = dn - do
        return wvec * d * d

    term = (
        dist(_tile5(qprev_t), _tile5(oprev_t))
        + dist(_tile5(_shift_rows(qprev_t, bpp)), _tile5(_shift_rows(oprev_t, bpp)))
        + dist(_shift_rows(qrow5, bpp), _tile5(_shift_rows(orow_t, bpp)))
    )
    e = jnp.sum(term.reshape(w, bpp, NUM_FILTERS * b), axis=1)  # (W, 5B)
    if px_mask5 is not None:
        e = e * px_mask5
    total = jnp.sum(e // 128, axis=0) + jnp.sum(e % 128, axis=0) // 128
    return total.reshape(NUM_FILTERS, b)


def _rank_tables(ofreq):
    """Equality-preserving dense rank (< 256) of each filter's 256-entry
    original-frequency table — the 8-bit payload of the packed selection key
    (rank order == value order, equal values get equal ranks)."""
    def rank1(v):
        order = jnp.argsort(v)
        sv = v[order]
        isnew = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), (sv[1:] != sv[:-1]).astype(jnp.int32)])
        return jnp.zeros((256,), jnp.int32).at[order].set(jnp.cumsum(isnew))
    return jax.vmap(rank1)(ofreq)


def _row_attempt(s_vec, bleed, adaptive, orow_t, oprev_t, qprev_t, e0, e1,
                 hist, ofreq5, *, w, bpp, b, table, interpret, packed,
                 w_real=None, wmax=0, fast_div=False):
    """One strength attempt for the whole batch. Returns per-filter results
    plus (5, B) cost and validity. w_real: optional (B,) real widths of
    padded rows (ragged batching)."""
    # the kernel wants every operand pre-tiled to 5B filter-major lanes
    # (in-kernel lane concatenation is not Mosaic-representable) and the
    # pixel/column-indexed operands in the 8-sublane-stride layout; the
    # dither buffers (e0/e1) are carried in stride-8 layout throughout
    hist_in5 = _tile5(hist)
    if packed:
        # ofreq5 holds the rank tables; seed the packed keys per attempt
        # (ranks differ per filter, the carried histogram does not)
        hist_in5 = hist_in5 * 256 + ofreq5
    wr5 = px_mask5 = col_mask5 = None
    if w_real is not None:
        wr5 = _tile5(w_real.astype(jnp.int32)[None, :])          # (1, 5B)
        px_mask5 = (lax.broadcasted_iota(jnp.int32, (w, 1), 0)
                    < wr5).astype(jnp.int32)                     # (W, 5B)
        col_mask5 = jnp.repeat(px_mask5, bpp, axis=0)            # (Wb, 5B)
    qrow8, hist5, e0n5, e1n5 = row_attempt_pallas(
        _tile5(s_vec), bleed, _tile5(_to_stride8(orow_t, w, bpp)),
        _tile5(_to_stride8(qprev_t, w, bpp)),
        _tile5(e0), _tile5(e1), hist_in5, ofreq5, wr5,
        w=w, bpp=bpp, b=b, table=table, interpret=interpret,
        packed=packed, wmax=wmax, fast_div=fast_div)
    qrow5 = _from_stride8(qrow8, w, bpp)
    if packed:
        counts = (hist5[:256] - hist_in5[:256]) >> 8
        hist5 = hist5 >> 8
    else:
        counts = hist5[:256] - hist_in5[:256]

    bits = jnp.where(hist5[:256] > 0, 33 + lax.clz(hist5[:256]), 0)
    total_cost = jnp.sum(counts * bits, axis=0).reshape(NUM_FILTERS, b)
    cost = total_cost + _deriv_error_div128(
        qrow5, qprev_t, orow_t, oprev_t, bpp, b, w, px_mask5)

    ok = lax.cond(
        adaptive,
        lambda: _msad_valid(qrow5, qprev_t, bpp, b, col_mask5),
        lambda: jnp.ones((NUM_FILTERS, b), bool))
    return qrow5, hist5, e0n5, e1n5, cost, ok


def _select_f(arr5, best_f, b: int):
    """Select per-image winner lanes: arr5 (R, 5B), best_f (B,) -> (R, B)."""
    r = arr5.shape[0]
    a = arr5.reshape(r, NUM_FILTERS, b)
    onehot = (jnp.arange(NUM_FILTERS, dtype=jnp.int32)[:, None]
              == best_f[None, :]).astype(arr5.dtype)
    return jnp.einsum("rfb,fb->rb", a, onehot)


def optimize_batch_pallas_t(rows_t, strength, bleed, *, bpp: int,
                            band_pad: int, use_row_filters: bool = True,
                            interpret: bool = False,
                            return_carry: bool = False,
                            ofreq_rows=None, ofreq=None,
                            w_real=None, h_real=None, wmax: int = 0,
                            fast_div: bool = False):
    """Optimize a batch in transposed layout.

    rows_t: (H, W*bpp, B) int32. Returns (qrows_t (H, W*bpp, B) int32,
    filters (H, B) int8). ofreq_rows overrides the rows used for the
    original-frequency pre-pass (the pre-pass always covers the WHOLE
    image, optimize_state.c:66-83 — pass the full image when rows_t is a
    slice of it); ofreq passes the precomputed (B, 5, 256) histograms
    directly so a caller that already built them (the image-kernel rank
    tables) does not pay the pre-pass twice. w_real/h_real: (B,) real
    sizes of padded planes (ragged batching)."""
    h, wb, b = rows_t.shape
    w = wb // bpp
    packed = h * w * bpp < PACKED_KEY_MAX_SAMPLES
    # both modes use the modular 256-row table (the window wraps in offset
    # space, u = (t - start) mod 256) — strength-independent, so one
    # compiled program per shape serves every strength
    table = 256

    # original-residual histograms (ranks thereof in packed mode),
    # extended-table, filter-major lanes — ALWAYS over the whole image
    src_rows = rows_t if ofreq_rows is None else ofreq_rows
    if ofreq is not None:
        if w_real is not None:
            w_real = jnp.asarray(w_real, jnp.int32)
    else:
        from pngloss_tpu.ops.pallas_hist import original_frequencies_pallas

        if w_real is not None:
            w_real = jnp.asarray(w_real, jnp.int32)
            h_real = (jnp.full((b,), h, jnp.int32) if h_real is None
                      else jnp.asarray(h_real, jnp.int32))
        ofreq = original_frequencies_pallas(
            jnp.moveaxis(src_rows, 2, 0).reshape(
                b, src_rows.shape[0], w, bpp), bpp,
            w_real, h_real, interpret=interpret)           # (B, 5, 256)
    if packed:
        ofreq_ext = jax.vmap(_rank_tables)(ofreq)   # rank payload
    else:
        ofreq_ext = ofreq                           # raw second-level freqs
    ofreq5 = jnp.transpose(ofreq_ext, (2, 1, 0)).reshape(table, NUM_FILTERS * b)

    strength = jnp.asarray(strength, jnp.int32)
    bleed = jnp.asarray(bleed, jnp.int32)
    rows_e = STRIDE * (w + 5)

    def y_step(carry, xs):
        qprev_t, oprev_t, e0, e1, hist = carry
        orow_t, y = xs
        adaptive = jnp.asarray(True) if not use_row_filters else (y == 0)

        def cond(st):
            return ~jnp.all(st[0])

        def body(st):
            found, s_vec, best_f, qsel, hsel, e0sel, e1sel = st
            qrow5, hist5, e0n5, e1n5, cost, ok = _row_attempt(
                s_vec[None, :], bleed, adaptive, orow_t, oprev_t, qprev_t,
                e0, e1, hist, ofreq5,
                w=w, bpp=bpp, b=b, table=table, interpret=interpret,
                packed=packed, w_real=w_real, wmax=wmax,
                fast_div=fast_div)
            found_real = jnp.any(ok, axis=0)                   # (B,)
            # where C would abort ("no good row" at strength 0,
            # pngloss_image.c:268), accept the min-cost row
            ok = ok | (~found_real & (s_vec <= 0))[None, :]
            found_now = found_real | (s_vec <= 0)
            bf = jnp.argmin(jnp.where(ok, cost, _I32_MAX), axis=0).astype(jnp.int32)
            upd = ~found & found_now                            # (B,)
            best_f = jnp.where(upd, bf, best_f)
            qsel = jnp.where(upd[None, :], _select_f(qrow5, bf, b), qsel)
            hsel = jnp.where(upd[None, :], _select_f(hist5, bf, b), hsel)
            e0sel = jnp.where(upd[None, :], _select_f(e0n5, bf, b), e0sel)
            e1sel = jnp.where(upd[None, :], _select_f(e1n5, bf, b), e1sel)
            s_next = jnp.where(found | found_now, s_vec, jnp.maximum(s_vec - 1, 0))
            return (found | found_now, s_next, best_f, qsel, hsel, e0sel, e1sel)

        init = (
            jnp.zeros((b,), bool),
            jnp.broadcast_to(strength, (b,)),   # scalar or per-image (B,)
            jnp.zeros((b,), jnp.int32),
            jnp.zeros((wb, b), jnp.int32),
            hist,
            e0,
            e1,
        )
        _, _, best_f, qsel, hsel, e0sel, e1sel = lax.while_loop(cond, body, init)
        return ((qsel, orow_t, e0sel, e1sel, hsel),
                (qsel, best_f.astype(jnp.int8)))

    carry0 = (
        jnp.zeros((wb, b), jnp.int32),
        jnp.zeros((wb, b), jnp.int32),
        jnp.zeros((rows_e, b), jnp.int32),
        jnp.zeros((rows_e, b), jnp.int32),
        jnp.zeros((table, b), jnp.int32),
    )
    ys = jnp.arange(h, dtype=jnp.int32)
    carry_f, (qrows_t, filters) = lax.scan(y_step, carry0, (rows_t, ys))
    if return_carry:
        return qrows_t, filters, carry_f
    return qrows_t, filters


def _image_kernel_eligible(h: int, w: int, bpp: int,
                           use_row_filters: bool,
                           band_pad: int = 128) -> bool:
    """The whole-image kernel requires CLI mode (only row 0 is adaptive, so
    rows >= 1 never hit the strength fallback) and packed-key range.

    It is the PRODUCTION path (PNGLOSS_IMAGE_KERNEL=0 reverts to per-row):
    true device throughput measured by dispatch slopes (fetch excluded) is
    ~6.5 MP/s/chip at B=25 vs ~5.8 for the per-row path at B=64 — 2.9x the
    per-lane rate, 1/500th the launch count, and a far smaller traced graph
    (3 kernel launches per program instead of H). Round-1's lower numbers
    were tunnel-fetch-bound measurements, not kernel time.

    Ineligible shapes (embedding mode where every row can hit the strength
    fallback, h<2, or images past the packed-key int32 range) use the
    per-row path."""
    import os
    if os.environ.get("PNGLOSS_IMAGE_KERNEL", "1") == "0":
        return False
    if not (use_row_filters and h >= 2
            and h * w * bpp < PACKED_KEY_MAX_SAMPLES):
        return False
    from pngloss_tpu.ops.pallas_image import max_batch_image

    # very wide rows can exceed the VMEM budget even at 128 lanes
    return max_batch_image(w, bpp, band_pad, h=h) >= 1


# (15, 23, 31, 63): strengths <= 15 sweep a 24-row rotated window instead
# of 40 (round-4: 0.1482 vs 0.1546 s/chunk at s=15); the <=23 class puts
# the headline s=19 on a 32-row window (round-5: 0.1250 vs 0.1278 in the
# <=31 class, docs/ABLATE_r5_pre.json w23).  A <=127 class for strengths
# 64-99 was measured and REJECTED on chip: at s=75 the dense 256-row path
# wins (0.1933 vs 0.1975 s/chunk, docs/ABLATE_r4.json s75_dense/s75_c127)
# — a 136-row rotation's dense leading stages plus a ~136-row sweep cost
# more than the 256-row dense sweep's simplicity.  docs/ROOFLINE.md
# records the analyses.
WMAX_CLASSES = (15, 23, 31, 63)


def wmax_class_for(s_max: int) -> int:
    """Rotated-window size class for a batch whose strengths are all
    <= s_max, or 0 for the dense 256-row selection. Classes are coarse so
    the per-(shape, class) compile cache stays small; beyond 63 the
    rotation's dense stages cost more than the smaller sweeps save."""
    for c in WMAX_CLASSES:
        if s_max <= c:
            return c
    return 0


@functools.partial(jax.jit, static_argnames=(
    "bpp", "band_pad", "interpret", "wmax", "adaptive", "fast_div"))
def _optimize_batch_pallas_image_jit(rows, strength, bleed, w_real=None,
                                     h_real=None, *, bpp, band_pad,
                                     interpret, wmax=0, adaptive=False,
                                     fast_div=False):
    """Row 0 via the per-row path (adaptive check + fallback), rows 1..H-1
    in ONE whole-image kernel launch (pallas_image.py).

    adaptive=True is the embedding-mode speculation: every row runs the
    MSAD self-check in-kernel at full strength; returns a third output
    ok (B,) — True iff every row had a passing filter, i.e. the
    speculative result equals the per-row fallback path's."""
    from pngloss_tpu.ops.pallas_image import image_rows_pallas

    b, h, wb = rows.shape
    w = wb // bpp
    table = 256   # modular table: strength-independent
    rows_t = jnp.transpose(rows.astype(jnp.int32), (1, 2, 0))   # (H, Wb, B)

    from pngloss_tpu.ops.pallas_hist import original_frequencies_pallas

    if w_real is not None:
        w_real = jnp.asarray(w_real, jnp.int32)
        h_real = (jnp.full((b,), h, jnp.int32) if h_real is None
                  else jnp.asarray(h_real, jnp.int32))
    ofreq = original_frequencies_pallas(
        rows.astype(jnp.int32).reshape(b, h, w, bpp), bpp,
        w_real, h_real, interpret=interpret)
    ranks = jax.vmap(_rank_tables)(ofreq)
    rank5 = jnp.transpose(ranks, (2, 1, 0)).reshape(table, NUM_FILTERS * b)

    strength = jnp.asarray(strength, jnp.int32)
    bleed = jnp.asarray(bleed, jnp.int32)

    # row 0 through the per-row machinery (reusing its scan body); the
    # pre-pass histograms computed above for the rank tables are passed
    # through so the program contains ONE pre-pass, not two
    q0, f0, carry = optimize_batch_pallas_t(
        rows_t[:1], strength, bleed, bpp=bpp, band_pad=band_pad,
        use_row_filters=not adaptive, interpret=interpret,
        return_carry=True, ofreq=ofreq, w_real=w_real, h_real=h_real,
        wmax=wmax, fast_div=fast_div)
    qprev_t, oprev_t, e0, e1, hist = carry

    s_vec = jnp.broadcast_to(strength, (1, b)).astype(jnp.int32)
    wr5 = _tile5(jnp.full((1, b), w, jnp.int32) if w_real is None
                 else w_real.astype(jnp.int32)[None, :])
    # original rows stream into the kernel UN-tiled (B lanes); the 5-filter
    # lane replication happens in-kernel (exact bf16 selection matmul), so
    # neither the XLA tile op nor 5x the HBM traffic is paid here
    orig_rows = jax.vmap(lambda r: _to_stride8(r, w, bpp))(rows_t[1:])
    qrows, filt, ok = image_rows_pallas(
        _tile5(s_vec), bleed, wr5, rank5, orig_rows,
        _tile5(_to_stride8(qprev_t, w, bpp)),
        _tile5(_to_stride8(oprev_t, w, bpp)),
        _tile5(e0), _tile5(e1), _tile5(hist),
        w=w, h=h, bpp=bpp, b=b, table=table, interpret=interpret,
        wmax=wmax, adaptive=adaptive, fast_div=fast_div)

    q_rest = qrows.reshape(h - 1, w, STRIDE, b)[:, :, :bpp]
    q_rest = q_rest.reshape(h - 1, wb, b)
    f_rest = filt[:, 0, :]
    qrows_t = jnp.concatenate([q0, q_rest])
    filters = jnp.concatenate([f0, f_rest.astype(jnp.int8)])
    q = jnp.transpose(qrows_t, (2, 0, 1)).astype(jnp.uint8)
    if adaptive:
        return (q, jnp.transpose(filters, (1, 0)),
                jnp.min(ok[:, 0, :], axis=0) > 0)
    return q, jnp.transpose(filters, (1, 0))


@functools.partial(jax.jit, static_argnames=(
    "bpp", "band_pad", "use_row_filters", "interpret", "wmax", "fast_div"))
def _optimize_batch_pallas_jit(rows, strength, bleed, w_real=None,
                               h_real=None, *, bpp, band_pad,
                               use_row_filters, interpret, wmax=0,
                               fast_div=False):
    b, h, wb = rows.shape
    rows_t = jnp.transpose(rows.astype(jnp.int32), (1, 2, 0))   # (H, Wb, B)
    qrows_t, filters = optimize_batch_pallas_t(
        rows_t, strength, bleed, bpp=bpp, band_pad=band_pad,
        use_row_filters=use_row_filters, interpret=interpret,
        w_real=w_real, h_real=h_real, wmax=wmax, fast_div=fast_div)
    q = jnp.transpose(qrows_t, (2, 0, 1)).astype(jnp.uint8)     # (B, H, Wb)
    return q, jnp.transpose(filters, (1, 0))


def max_batch_for(w: int, bpp: int, band_pad: int,
                  vmem_budget: int = 44 << 20) -> int:
    # the 44MB default is empirical: a 43MB operand footprint compiles and
    # runs on v5e (the kernel's vmem_limit_bytes is raised to match);
    # throughput saturates around B=64 for 512-wide RGB rows
    """Largest per-kernel batch that fits the VMEM budget (all kernel
    operands are int32; 5B-lane arrays dominate)."""
    del band_pad   # modular table: strength-independent
    table = 256
    wb = w * bpp
    # every kernel operand is 5B lanes x int32: orig+qprev+qrow = 3 row
    # buffers, 5 dither buffers (e0, e1, e0n, e1n, err0 scratch), hist +
    # hist_out + ofreq tables
    del wb
    per_b = 4 * NUM_FILTERS * (
        3 * STRIDE * w + 5 * STRIDE * (w + 5) + 3 * table)
    return max(8, min(512, (vmem_budget // per_b) // 8 * 8))


def optimize_batch_pallas(rows, strength, bleed: int = 2, *, bpp: int,
                          use_row_filters: bool = True,
                          interpret: bool | None = None,
                          band_pad: int | None = None,
                          w_real=None, h_real=None,
                          wmax: int | None = None):
    """Pallas-kernel counterpart of optimize.optimize_batch.

    rows: (B, H, W*bpp) uint8. strength: int or per-image (B,) values.
    w_real/h_real: optional per-image (B,) real sizes of padded planes
    (ragged batching — strength is promoted to a vector so one program
    serves every real size). Returns ((B,H,W*bpp) uint8, (B,H) int8).
    On non-TPU backends the kernel runs in interpreter mode. Batches larger
    than the kernel's VMEM budget are processed in equal-size chunks (the
    last chunk padded with copies — images are independent). When strength
    is a traced value (e.g. under shard_map), band_pad must be given."""
    import numpy as np

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, _, wb = rows.shape
    # _tdiv_pos exactness guard (pallas_row.py): at bleed == 1 the dither
    # error can grow ~255 per dependency hop, and past ~2^20 the kernels'
    # reciprocal-multiply division loses bit-exactness. Route that (rare,
    # pathological: >4k-row images at -b 1) regime to the pure-XLA path,
    # whose native integer division is exact for all int32. Hop count =
    # rows + intra-row chain (one hop per 3 columns).
    hops = rows.shape[1] + wb // bpp // 3
    if hops > 4000:
        if isinstance(bleed, jax.core.Tracer):
            # the guard cannot be evaluated: a traced bleed COULD be 1 at
            # runtime, silently losing _tdiv_pos bit-exactness. mesh.py
            # pre-routes its shard_map entry host-side; any other traced
            # caller must do the same (advisor finding r3#2)
            raise ValueError(
                "optimize_batch_pallas: bleed is traced and the image has "
                ">4000 dependency hops, so the bleed==1 exactness reroute "
                "cannot be evaluated. Pre-route bleed==1 calls to "
                "impl='xla' before jitting (see parallel/mesh.py), or pass "
                "a concrete bleed.")
        if int(bleed) == 1:
            # pure-XLA path: exact native integer division; traceable, so
            # the reroute is safe even when rows is a tracer
            from pngloss_tpu.ops.optimize import optimize_batch

            return optimize_batch(
                rows, strength, bleed, bpp=bpp,
                use_row_filters=use_row_filters,
                band_pad=band_pad, w_real=w_real, h_real=h_real)
    # one-correction reciprocal division (_tdiv_pos corrections=1): exact
    # while operands stay < 2^16.  bleed >= 2 bounds every division
    # operand by 255 + 766 (the Sierra chain has fixed point 255), so it
    # always qualifies; at bleed == 1 the dither error can grow ~255 per
    # hop, so 250 hops keeps 255*250 + 766 < 2^16.  A traced bleed could
    # be 1 at runtime — then only the hop bound may be assumed.
    # PNGLOSS_FAST_DIV=0 forces the two-correction form (safety fallback
    # + the ablation comparator, docs/ABLATE_r5.json slowdiv).
    import os
    fast_div = (hops <= 250 or (not isinstance(bleed, jax.core.Tracer)
                                and int(bleed) >= 2)) \
        and os.environ.get("PNGLOSS_FAST_DIV", "1") != "0"
    # strength may be a scalar or per-image array (the kernel's band math is
    # per-lane, so mixed strengths batch together — the reference suite's
    # 1,089 sequential invocations become a handful of dispatches)
    traced = isinstance(rows, jax.core.Tracer) or isinstance(strength, jax.core.Tracer)
    per_image = not np.isscalar(strength) and (
        traced or np.ndim(strength) > 0)
    ragged = w_real is not None or h_real is not None
    if band_pad is None:
        s_max = int(np.max(strength)) if per_image else int(strength)
        band_pad = band_pad_for(s_max)
    # the Pallas kernels use the modular 256-row table in both packed
    # and non-packed modes: band_pad never reaches them, so normalize it
    # out of the jit cache key — ONE compiled program per shape serves
    # every strength
    band_pad = 0
    s_arr = (jnp.asarray(strength, jnp.int32) if per_image
             else jnp.int32(strength))
    if ragged:
        # promote everything per-image so one program serves all sizes
        per_image = True
        s_arr = jnp.broadcast_to(s_arr, (b,))
        w_real = (jnp.full((b,), wb // bpp, jnp.int32) if w_real is None
                  else jnp.asarray(w_real, jnp.int32))
        h_real = (jnp.full((b,), rows.shape[1], jnp.int32) if h_real is None
                  else jnp.asarray(h_real, jnp.int32))
    use_image = _image_kernel_eligible(rows.shape[1], wb // bpp, bpp,
                                       use_row_filters, band_pad)
    # embedding-mode speculation (optimizeForAverageFilter): run the
    # whole-image kernel with the MSAD self-check in-kernel; images where
    # any row had no passing filter (the strength-fallback case,
    # pngloss_image.c:266-275) are re-run through the per-row path
    use_image_embed = (
        not use_row_filters and not traced
        and _image_kernel_eligible(rows.shape[1], wb // bpp, bpp, True,
                                   band_pad))
    if wmax is None:
        # rotated-window class from the batch's max strength (host-known
        # unless we are inside an outer trace, where the caller must pass
        # wmax explicitly to opt in — dense is always correct)
        wmax = (0 if isinstance(strength, jax.core.Tracer)
                else wmax_class_for(int(np.max(strength))))

    def _run(part, s_part, wr=None, hr=None):
        if use_image:
            return _optimize_batch_pallas_image_jit(
                part, s_part, jnp.int32(bleed), wr, hr,
                bpp=bpp, band_pad=band_pad, interpret=interpret,
                wmax=wmax, fast_div=fast_div)
        return _optimize_batch_pallas_jit(
            part, s_part, jnp.int32(bleed), wr, hr,
            bpp=bpp, band_pad=band_pad,
            use_row_filters=use_row_filters, interpret=interpret,
            wmax=wmax, fast_div=fast_div)

    def _run_embed(part, s_part, wr=None, hr=None):
        q, f, ok = _optimize_batch_pallas_image_jit(
            part, s_part, jnp.int32(bleed), wr, hr,
            bpp=bpp, band_pad=band_pad, interpret=interpret,
            wmax=wmax, adaptive=True, fast_div=fast_div)
        ok = np.asarray(ok)
        if ok.all():
            return q, f
        # some image needed the strength fallback: the speculative state
        # past the failing row is invalid for it — re-run the chunk
        # through the per-row path (rare; keeps program shapes stable)
        q, f = np.array(q), np.array(f)
        q2, f2 = _run(part, s_part, wr, hr)
        bad = ~ok
        q[bad] = np.asarray(q2)[bad]
        f[bad] = np.asarray(f2)[bad]
        return q, f

    runner = _run_embed if use_image_embed else _run
    if traced:
        # inside an outer trace (shard_map/jit): no host-side chunking
        return _run(rows, s_arr, w_real, h_real)
    if use_image or use_image_embed:
        from pngloss_tpu.ops.pallas_image import max_batch_image
        chunk = min(b, max_batch_image(wb // bpp, bpp, band_pad,
                                       h=rows.shape[1]))
    else:
        chunk = min(b, max_batch_for(wb // bpp, bpp, band_pad))
    if b <= chunk:
        return runner(rows, s_arr, w_real, h_real)

    def _pad(a, n):
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (chunk - n,) + a.shape[1:])])

    qs, fs = [], []
    for i in range(0, b, chunk):
        part = rows[i:i + chunk]
        s_part = s_arr[i:i + chunk] if per_image else s_arr
        wr = w_real[i:i + chunk] if ragged else None
        hr = h_real[i:i + chunk] if ragged else None
        n = part.shape[0]
        if n < chunk:
            part = _pad(part, n)
            if per_image:
                s_part = _pad(s_part, n)
            if ragged:
                wr, hr = _pad(wr, n), _pad(hr, n)
        q, f = runner(part, s_part, wr, hr)
        qs.append(np.asarray(q)[:n])
        fs.append(np.asarray(f)[:n])
    return np.concatenate(qs), np.concatenate(fs)
