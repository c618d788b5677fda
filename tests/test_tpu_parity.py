"""On-chip parity gate: the COMPILED TPU kernels vs the C oracle.

The regular suite runs the Pallas kernels in interpreter mode on CPU, and
interpret mode accepts programs the Mosaic TC compiler rejects or lowers
differently — so a compiled-kernel regression would pass CPU CI. This
gate (PNGLOSS_TEST_TPU=1, run on a machine with a TPU) drives real PNGs
through the full production pipeline compiled on the chip and requires
byte-identical output:

    PNGLOSS_TEST_TPU=1 python -m pytest tests/test_tpu_parity.py -q

Coverage: RGB (rose), grayscale (david), RGBA with transparent pixels
(redbrush — exercises the transparent-pixel symbol rule), palette (tux —
exercises the palette-expansion read path), at strengths 0 (lossless
pixels), 19 (default) and 40 — both band_pad compile buckets, the
whole-image kernel (default) and the per-row kernel.
"""

import os

import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("PNGLOSS_TEST_TPU"),
    reason="on-chip gate: set PNGLOSS_TEST_TPU=1 on a TPU machine")

FILES = ("rose.png", "david.png", "redbrush.png", "tux.png")


def _tpu_or_skip():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")


@requires_tpu
def test_compiled_image_kernel_parity(oracle, suite_dir):
    _tpu_or_skip()
    from pngloss_tpu.suite import run_suite

    paths = [os.path.join(suite_dir, n) for n in FILES]
    results, summary = run_suite(paths, [0, 19, 40, 200], oracle=oracle,
                                 verbose=False)
    bad = [r for r in results if not r.get("byte_identical")]
    assert summary["all_byte_identical"], bad


@requires_tpu
def test_compiled_ragged_parity(oracle, suite_dir):
    """Mixed-size images padded+masked into shared programs must stay
    byte-identical when COMPILED on the chip (the masks ride the kernel's
    hot loop — interpret mode is not proof)."""
    _tpu_or_skip()
    import numpy as np

    from pngloss_tpu import codec
    from pngloss_tpu.pipeline import compress_many
    from tests.conftest import run_oracle

    rose = codec.decode(open(os.path.join(suite_dir, "rose.png"), "rb").read())
    pngs = []
    for h, w in ((46, 70), (40, 61), (33, 70), (46, 57)):
        pngs.append(codec.encode(np.ascontiguousarray(rose.rgba[:h, :w])))
    outs = compress_many(pngs, strength=[19, 19, 40, 0])
    for png, s, res in zip(pngs, [19, 19, 40, 0], outs):
        assert res.error is None
        assert res.data == run_oracle(oracle, png, s), (s, len(png))


@requires_tpu
def test_compiled_row_kernel_parity(oracle, suite_dir, monkeypatch):
    _tpu_or_skip()
    monkeypatch.setenv("PNGLOSS_IMAGE_KERNEL", "0")
    from pngloss_tpu.suite import run_suite

    paths = [os.path.join(suite_dir, "rose.png")]
    results, summary = run_suite(paths, [19], oracle=oracle, verbose=False)
    assert summary["all_byte_identical"], results


@requires_tpu
def test_compiled_embedding_mode_parity(suite_dir):
    """optimizeForAverageFilter (every row adaptive + per-row strength
    fallback) COMPILED on chip vs the scalar parity anchor. The embedding
    API has no CLI surface in the reference (pngloss_image.c:29), so the
    oracle here is core.reference, itself byte-parity-anchored."""
    _tpu_or_skip()
    import numpy as np

    from pngloss_tpu import codec
    from pngloss_tpu.core import reference as ref
    from pngloss_tpu.pipeline import optimize_for_average_filter

    rose = codec.decode(
        open(os.path.join(suite_dir, "rose.png"), "rb").read())
    rgba = np.ascontiguousarray(rose.rgba[:24, :31])
    got = optimize_for_average_filter(rgba, strength=19)
    from pngloss_tpu.pipeline import reduce_colorspace, restore_colorspace

    work, bpp = reduce_colorspace(rgba)
    q_ref, _ = ref.optimize_image(work, bpp, 19, use_row_filters=False)
    np.testing.assert_array_equal(
        got, restore_colorspace(q_ref, bpp, rgba.shape[1]))


@pytest.mark.skipif(
    not os.environ.get("PNGLOSS_TEST_TPU_FULL"),
    reason="full-domain sweep: set PNGLOSS_TEST_TPU_FULL=1 (a few minutes)")
def test_compiled_full_strength_domain(oracle, suite_dir):
    """Every strength 0..255 on rose.png, compiled on chip, byte-identical
    to the C tool (the modular table serves all strengths from the same
    compiled programs, so this is one batched dispatch + 256 oracle runs)."""
    _tpu_or_skip()
    from pngloss_tpu.pipeline import compress_many
    from tests.conftest import run_oracle

    rose = open(os.path.join(suite_dir, "rose.png"), "rb").read()
    strengths = list(range(256))
    outs = compress_many([rose] * 256, strengths, 2)
    bad = [s for s, r in zip(strengths, outs)
           if r.unwrap() != run_oracle(oracle, rose, s)]
    assert not bad, bad


@requires_tpu
def test_compiled_nonpacked_parity(oracle, suite_dir, monkeypatch):
    """The non-packed (big-image) 3-level modular selection COMPILED on
    the chip: shrink the packed-key threshold so rose.png takes the
    branch real 8+ MP images take (interpret mode is not proof)."""
    _tpu_or_skip()
    from pngloss_tpu.ops import optimize_pallas as OP
    from pngloss_tpu.suite import run_suite

    monkeypatch.setattr(OP, "PACKED_KEY_MAX_SAMPLES", 1)
    paths = [os.path.join(suite_dir, "rose.png")]
    results, summary = run_suite(paths, [19, 40], oracle=oracle,
                                 verbose=False)
    assert summary["all_byte_identical"], results
