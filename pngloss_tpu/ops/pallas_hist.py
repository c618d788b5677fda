"""Pallas TPU kernel for the original-frequency pre-pass histograms.

The reference's init pre-pass (optimize_state.c:66-83) histograms the
original image's residuals under each of the 5 PNG filters. The XLA
formulation (optimize.py:_original_frequencies) computes it as a nibble
one-hot MXU contraction, but under vmap+scan XLA materializes the
(chunk, 80) one-hot operands through HBM — measured ~30 ms of the
~60 ms non-kernel time per 25-image chunk. This kernel builds the
one-hots in VMEM and contracts them on the MXU without any HBM
round-trip.

Math (identical to the XLA path): for each filter f,
  hist[16*i + j] = sum_s [hi_s == i] * [lo_s == j]
with hi/lo the residual nibbles. Both one-hots live as (80, ch) tiles
(rows = 5 filters x 16 nibble values, lanes = samples); the 16-row
filter-block replication of the (5, ch) nibble rows is an exact bf16
MXU matmul, and the contraction A @ B^T accumulates (80, 80) f32 per
image across grid steps (exact while counts < 2^24). Padded / ragged-
masked samples are encoded as symbol 256 upstream: their hi nibble is
16, which matches no one-hot row, so they contribute nothing — the
kernel needs no weight operand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_FILTERS = 5
CHUNK = 1 << 14          # samples per grid step (lanes of the one-hot tiles)


def _hist_kernel(syms_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _zero():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0, :, :])

    s5 = syms_ref[0, :, :]                       # (5, ch) int32, 256 = pad
    # replicate each filter row into its 16-row block: E (80, 5) with
    # E[k, f] = [k // 16 == f]; values <= 16 are exact in bf16
    row80 = lax.broadcasted_iota(jnp.int32, (80, NUM_FILTERS), 0) // 16
    col80 = lax.broadcasted_iota(jnp.int32, (80, NUM_FILTERS), 1)
    e_rep = (row80 == col80).astype(jnp.bfloat16)
    hi80 = jnp.dot(e_rep, (s5 >> 4).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    lo80 = jnp.dot(e_rep, (s5 & 15).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    nib = lax.broadcasted_iota(jnp.int32, (80, 1), 0) & 15
    a = (hi80 == nib).astype(jnp.bfloat16)       # pad rows (hi=16) all-zero
    b = (lo80 == nib).astype(jnp.bfloat16)
    part = lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)
    out_ref[0, :, :] = out_ref[0, :, :] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def _hist_contract(syms, *, interpret: bool = False):
    """syms: (B, 5, n_pad) int32 with pad/masked samples set to 256.
    Returns (B, 80, 80) f32 nibble outer products."""
    bsz, _, n_pad = syms.shape
    grid = (bsz, n_pad // CHUNK)
    return pl.pallas_call(
        _hist_kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((bsz, 80, 80), jnp.float32),
        in_specs=[pl.BlockSpec((1, NUM_FILTERS, CHUNK),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 80, 80), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(syms)


def original_frequencies_pallas(imgs, bpp: int, w_real=None, h_real=None,
                                *, interpret: bool = False):
    """(B, H, W, bpp) int32 original images -> (B, 5, 256) int32 residual
    histograms under the 5 filters (batched optimize_state.c:66-83).
    w_real/h_real: (B,) real sizes of padded planes (ragged batching)."""
    bsz, h, w, _ = imgs.shape
    above = jnp.concatenate([jnp.zeros_like(imgs[:, :1]), imgs[:, :-1]],
                            axis=1)
    left = jnp.concatenate([jnp.zeros_like(imgs[:, :, :1]), imgs[:, :, :-1]],
                           axis=2)
    diag = jnp.concatenate([jnp.zeros_like(above[:, :, :1]),
                            above[:, :, :-1]], axis=2)
    from pngloss_tpu.ops.optimize import _predict5

    syms = jnp.stack(
        [((imgs - _predict5(above, diag, left, f)) & 0xFF).reshape(bsz, -1)
         for f in range(NUM_FILTERS)], axis=1)            # (B, 5, n)
    if w_real is not None or h_real is not None:
        keep = jnp.ones((bsz, h, w), bool)
        if w_real is not None:
            keep &= jnp.arange(w)[None, None, :] < w_real[:, None, None]
        if h_real is not None:
            keep &= jnp.arange(h)[None, :, None] < h_real[:, None, None]
        keep = jnp.broadcast_to(keep[:, :, :, None],
                                (bsz, h, w, bpp)).reshape(bsz, 1, -1)
        syms = jnp.where(keep, syms, 256)
    n = syms.shape[2]
    n_pad = -(-n // CHUNK) * CHUNK
    syms = jnp.pad(syms, ((0, 0), (0, 0), (0, n_pad - n)),
                   constant_values=256)
    full = _hist_contract(syms, interpret=interpret)
    full = full.astype(jnp.int32).reshape(bsz, NUM_FILTERS, 16, NUM_FILTERS, 16)
    return jnp.stack([full[:, f, :, f, :].reshape(bsz, 256)
                      for f in range(NUM_FILTERS)], axis=1)
