"""Bit-exactness of the Pallas row-kernel path vs the scalar model.

On CPU the kernel runs in Pallas interpreter mode — same semantics as the
compiled TPU kernel, exercised on real hardware by the TPU probe/bench.
"""

import numpy as np
import pytest

from pngloss_tpu.core import reference as ref
from pngloss_tpu.ops.optimize_pallas import optimize_batch_pallas


def _check(rows, bpp, strength, bleed=2, use_row_filters=True):
    batch = rows[None] if rows.ndim == 2 else rows
    q, f = optimize_batch_pallas(
        batch, strength, bleed, bpp=bpp, use_row_filters=use_row_filters)
    for i in range(batch.shape[0]):
        qr, fr = ref.optimize_image(batch[i], bpp, strength, bleed, use_row_filters)
        np.testing.assert_array_equal(np.asarray(f[i]), fr)
        np.testing.assert_array_equal(np.asarray(q[i]), qr)


@pytest.mark.parametrize("bpp", [1, 2, 3, 4])
def test_random_all_bpp(bpp):
    rng = np.random.default_rng(20 + bpp)
    rows = rng.integers(0, 256, size=(2, 6, 7 * bpp), dtype=np.uint8)
    if bpp % 2 == 0:  # exercise the transparent-pixel rule too
        rows.reshape(2, 6, 7, bpp)[:, 1::2, ::2, bpp - 1] = 0
    for strength in (0, 3, 19):
        _check(rows, bpp, strength)


def test_forced_wmax_classes():
    """Every rotated-window class is exact when forced explicitly,
    independent of wmax_class_for's selection — including the 127-row
    class that only tools/ablate.py exercises (its measurement is only
    meaningful if the class is correct) and the dense fallback under a
    class-eligible strength."""
    rng = np.random.default_rng(47)
    rows = rng.integers(0, 256, size=(2, 6, 7 * 3), dtype=np.uint8)
    for wmax, strengths in ((15, (0, 9, 15)), (23, (16, 19, 23)),
                            (31, (15, 31)),
                            (63, (40, 63)), (127, (75, 100, 127)),
                            (0, (15, 75))):
        for strength in strengths:
            q, f = optimize_batch_pallas(rows, strength, 2, bpp=3, wmax=wmax)
            for i in range(rows.shape[0]):
                qr, fr = ref.optimize_image(rows[i], 3, strength, 2, True)
                np.testing.assert_array_equal(np.asarray(f[i]), fr)
                np.testing.assert_array_equal(np.asarray(q[i]), qr)


def test_large_strength_and_bleed():
    rng = np.random.default_rng(30)
    rows = rng.integers(0, 256, size=(4, 5 * 3), dtype=np.uint8)
    _check(rows, 3, 255)       # band_pad 256 variant
    _check(rows, 3, 19, bleed=1)
    _check(rows, 3, 19, bleed=32767)


def test_embedding_mode():
    rng = np.random.default_rng(31)
    rows = rng.integers(0, 256, size=(4, 5 * 3), dtype=np.uint8)
    _check(rows, 3, 19, use_row_filters=False)


def test_smooth_gradient():
    g = (np.arange(12)[:, None] * 7 + np.arange(14 * 3)[None, :] * 3).astype(np.uint8)
    _check(g, 3, 19)


def test_matches_xla_path():
    from pngloss_tpu.ops.optimize import optimize_batch
    rng = np.random.default_rng(32)
    rows = rng.integers(0, 256, size=(3, 5, 6 * 3), dtype=np.uint8)
    qp, fp = optimize_batch_pallas(rows, 19, bpp=3)
    qx, fx = optimize_batch(rows, 19, bpp=3)
    np.testing.assert_array_equal(np.asarray(qp), np.asarray(qx))
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(fx))


def test_mixed_strengths_one_batch():
    import numpy as np
    rng = np.random.default_rng(40)
    rows = rng.integers(0, 256, size=(4, 5, 6 * 3), dtype=np.uint8)
    strengths = [0, 7, 19, 40]
    q, f = optimize_batch_pallas(rows, np.asarray(strengths), bpp=3)
    for i, s in enumerate(strengths):
        qr, fr = ref.optimize_image(rows[i], 3, s)
        np.testing.assert_array_equal(np.asarray(q)[i], qr)
        np.testing.assert_array_equal(np.asarray(f)[i], fr)


def test_image_kernel_default_and_opt_out(monkeypatch):
    """The whole-image kernel (rows 1..H-1 in one launch) is the default
    production path for eligible shapes; PNGLOSS_IMAGE_KERNEL=0 reverts to
    the per-row kernel. Both stay bit-exact."""
    from pngloss_tpu.ops.optimize_pallas import _image_kernel_eligible

    assert _image_kernel_eligible(6, 7, 3, True)
    assert not _image_kernel_eligible(6, 7, 3, False)   # embedding mode
    assert not _image_kernel_eligible(1, 7, 3, True)    # single row
    rng = np.random.default_rng(50)
    for bpp in (1, 3, 4):
        rows = rng.integers(0, 256, size=(2, 6, 7 * bpp), dtype=np.uint8)
        _check(rows, bpp, 19)
        _check(rows, bpp, 0)
    monkeypatch.setenv("PNGLOSS_IMAGE_KERNEL", "0")
    assert not _image_kernel_eligible(6, 7, 3, True)
    rows = rng.integers(0, 256, size=(2, 6, 7 * 3), dtype=np.uint8)
    _check(rows, 3, 19)


def test_tdiv_pos_exactness_boundary():
    """Empirical sweep of _tdiv_pos's exactness domain: under IEEE f32
    (the CPU backend) the reciprocal-multiply + two corrections is exact
    through u < 2^24 — the kernels claim only u < 2^20, a 16x margin for
    the TPU's approximate reciprocal (see pallas_row.py:_tdiv_pos)."""
    import jax
    import jax.numpy as jnp

    from pngloss_tpu.ops.pallas_row import _tdiv_pos

    f = jax.jit(lambda u, d: _tdiv_pos(u, d))
    rng = np.random.default_rng(0)
    for div in (1, 2, 3, 5, 7, 9, 16, 127, 255, 4097, 32767):
        qmax = ((1 << 24) - 1) // div
        qs = np.unique(np.concatenate([
            rng.integers(0, qmax + 1, 512),
            np.array([0, 1, 2, qmax - 1, qmax])])).astype(np.int64)
        # worst cases: exact multiples and one-below (quotient boundaries)
        us = np.concatenate([qs * div, np.maximum(qs * div - 1, 0)])
        us = np.unique(us[us < (1 << 24)]).astype(np.int32)
        got = np.asarray(f(jnp.asarray(us), jnp.int32(div)))
        np.testing.assert_array_equal(got, us // div, err_msg=f"div={div}")


def test_tdiv_pos_one_correction_boundary():
    """corrections=1 (the fast_div kernel path): under IEEE f32 a single
    correction step is exact through u < 2^23 — the kernels only claim
    u < 2^16 (128x margin for the TPU's approximate reciprocal), with the
    operand domain proven by the caller (optimize_batch_pallas: bleed >= 2,
    or <= 250 dependency hops at bleed == 1)."""
    import jax
    import jax.numpy as jnp

    from pngloss_tpu.ops.pallas_row import _tdiv_pos

    f = jax.jit(lambda u, d: _tdiv_pos(u, d, corrections=1))
    rng = np.random.default_rng(1)
    for div in (1, 2, 3, 5, 7, 9, 16, 127, 255, 4097, 32767):
        qmax = ((1 << 23) - 1) // div
        qs = np.unique(np.concatenate([
            rng.integers(0, qmax + 1, 512),
            np.array([0, 1, 2, qmax - 1, qmax])])).astype(np.int64)
        us = np.concatenate([qs * div, np.maximum(qs * div - 1, 0)])
        us = np.unique(us[us < (1 << 23)]).astype(np.int32)
        got = np.asarray(f(jnp.asarray(us), jnp.int32(div)))
        np.testing.assert_array_equal(got, us // div, err_msg=f"div={div}")


def test_bleed1_tall_image_routes_to_xla(monkeypatch):
    """bleed == 1 lets dither error grow ~255 per hop; past ~4000 hops the
    Pallas division could leave its exactness domain, so such batches must
    route to the pure-XLA path (native exact int division)."""
    from pngloss_tpu.ops import optimize as optimize_mod

    calls = []
    real = optimize_mod.optimize_batch

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(optimize_mod, "optimize_batch", spy)
    rng = np.random.default_rng(60)
    rows = rng.integers(0, 256, size=(1, 4100, 3), dtype=np.uint8)
    q, f = optimize_batch_pallas(rows, 19, 1, bpp=1)
    assert calls, "tall bleed=1 batch did not route to the XLA path"
    assert q.shape == rows.shape
    # short images at bleed 1 stay on the Pallas path
    calls.clear()
    rows = rng.integers(0, 256, size=(1, 6, 3), dtype=np.uint8)
    optimize_batch_pallas(rows, 19, 1, bpp=1)
    assert not calls


def test_embedding_speculation_and_fallback(monkeypatch):
    """Embedding mode (optimizeForAverageFilter) speculates rows at full
    strength through the whole-image kernel with the MSAD self-check
    in-kernel; images where some row had no passing filter re-run through
    the per-row fallback path. Both branches must be bit-exact vs the
    scalar model (seed chosen so the batch mixes ok and failed images)."""
    from pngloss_tpu.ops import optimize_pallas as OP

    calls = {"embed": 0, "perrow": 0}
    real_img = OP._optimize_batch_pallas_image_jit
    real_row = OP._optimize_batch_pallas_jit

    def spy_img(*a, **k):
        if k.get("adaptive"):
            calls["embed"] += 1
        return real_img(*a, **k)

    def spy_row(*a, **k):
        calls["perrow"] += 1
        return real_row(*a, **k)

    monkeypatch.setattr(OP, "_optimize_batch_pallas_image_jit", spy_img)
    monkeypatch.setattr(OP, "_optimize_batch_pallas_jit", spy_row)

    rng = np.random.default_rng(700)     # probed: ok = [F, T, F, F]
    rows = rng.integers(0, 256, size=(4, 6, 7 * 3), dtype=np.uint8)
    _check(rows, 3, 45, use_row_filters=False)
    assert calls["embed"] >= 1, "speculative image path not taken"
    assert calls["perrow"] >= 1, "fallback per-row path not taken"

    calls["embed"] = calls["perrow"] = 0
    rng = np.random.default_rng(711)     # probed: every image passes
    rows = rng.integers(0, 256, size=(4, 6, 7 * 3), dtype=np.uint8)
    _check(rows, 3, 45, use_row_filters=False)
    assert calls["embed"] >= 1
    assert calls["perrow"] == 0, "no-fallback batch must not re-run"


def test_nonpacked_big_image_path(monkeypatch):
    """Images past the packed-key int32 range use the per-row kernel's
    non-packed (3-level extended-table) selection. Force that branch on
    small images by shrinking the sample threshold and pin it against the
    scalar model across bpp/strength/bleed."""
    from pngloss_tpu.ops import optimize_pallas as OP

    monkeypatch.setattr(OP, "PACKED_KEY_MAX_SAMPLES", 1)
    rng = np.random.default_rng(80)
    for bpp, strength, bleed in ((3, 19, 2), (1, 40, 2), (4, 200, 1),
                                 (2, 7, 17)):
        rows = rng.integers(0, 256, size=(2, 5, 6 * bpp), dtype=np.uint8)
        _check(rows, bpp, strength, bleed)


def test_traced_bleed_tall_image_raises():
    """Advisor finding r3#2: a traced bleed on a >4000-hop image cannot
    evaluate the bleed==1 exactness reroute — must raise at trace time,
    not silently lose bit-exactness."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from pngloss_tpu.ops.optimize_pallas import optimize_batch_pallas

    rows = jnp.zeros((1, 4100, 8), jnp.uint8)
    with pytest.raises(ValueError, match="bleed is traced"):
        jax.jit(lambda r, b: optimize_batch_pallas(
            r, 19, b, bpp=1, band_pad=64, interpret=True))(rows, jnp.int32(2))

    # concrete bleed==1 on the same shape reroutes (even under jit of rows)
    q, f = optimize_batch_pallas(np.zeros((1, 4100, 8), np.uint8), 19, 1,
                                 bpp=1, band_pad=64, interpret=True)
    assert q.shape == (1, 4100, 8)
