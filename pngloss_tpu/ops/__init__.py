import jax

from pngloss_tpu.ops.optimize import optimize_batch, optimize_plane_jax
from pngloss_tpu.ops.optimize_pallas import (
    max_batch_for,
    optimize_batch_pallas,
)


def optimize_batch_auto(rows, strength, bleed: int = 2, *, bpp: int,
                        use_row_filters: bool = True, impl: str = "auto",
                        band_pad: int | None = None,
                        interpret: bool | None = None):
    """Dispatch to the Pallas kernel on TPU, the pure-XLA path elsewhere.

    impl: 'auto' | 'pallas' | 'xla'. strength: int or per-image values.
    interpret forces the Pallas interpreter (needed when the computation
    is placed on CPU devices while the default backend is a TPU).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return optimize_batch_pallas(
            rows, strength, bleed, bpp=bpp, use_row_filters=use_row_filters,
            band_pad=band_pad, interpret=interpret)
    return optimize_batch(
        rows, strength, bleed, bpp=bpp, use_row_filters=use_row_filters,
        band_pad=band_pad)


__all__ = [
    "optimize_batch",
    "optimize_batch_auto",
    "optimize_batch_pallas",
    "optimize_plane_jax",
    "max_batch_for",
]
