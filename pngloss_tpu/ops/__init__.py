import jax

from pngloss_tpu import compile_cache
from pngloss_tpu.ops.optimize import optimize_batch, optimize_plane_jax

compile_cache.enable()   # every compute path imports this package first
from pngloss_tpu.ops.optimize_pallas import (
    _image_kernel_eligible,
    max_batch_for,
    optimize_batch_pallas,
)

# batch sizes device programs are padded to: one program per (shape, size
# class) instead of one per request size, so the (slow, tunnel-remote)
# compile cache stays small and every repeat batch is a hit. 0 stands for
# the path's VMEM-limited chunk quantum.
BATCH_SIZE_CLASSES = (1, 8, 0)


def device_batch_quantum(h: int, w: int, bpp: int, band_pad: int,
                         use_row_filters: bool, impl: str = "auto") -> int:
    """Largest per-dispatch batch for the selected device path (the VMEM
    budget of the Pallas kernels; unbounded for the pure-XLA path)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl != "pallas":
        return UNBOUNDED_BATCH
    if _image_kernel_eligible(h, w, bpp, use_row_filters, band_pad):
        from pngloss_tpu.ops.pallas_image import max_batch_image

        return max_batch_image(w, bpp, band_pad, h=h)
    return max_batch_for(w, bpp, band_pad)


UNBOUNDED_BATCH = 1 << 29


def pad_batch_size(n: int, quantum: int) -> int:
    """Smallest size class >= n. Partial chunks of a VMEM-bounded path pad
    to the quantum itself; an unbounded path (pure XLA) keeps its exact
    size above the largest finite class."""
    for c in BATCH_SIZE_CLASSES:
        c = c or (quantum if quantum < UNBOUNDED_BATCH else n)
        if n <= c <= quantum:
            return c
    return min(n, quantum)


def optimize_batch_auto(rows, strength, bleed: int = 2, *, bpp: int,
                        use_row_filters: bool = True, impl: str = "auto",
                        band_pad: int | None = None,
                        interpret: bool | None = None,
                        w_real=None, h_real=None,
                        wmax: int | None = None):
    """Dispatch to the Pallas kernel on TPU, the pure-XLA path elsewhere.

    impl: 'auto' | 'pallas' | 'xla'. strength: int or per-image values.
    interpret forces the Pallas interpreter (needed when the computation
    is placed on CPU devices while the default backend is a TPU).
    w_real/h_real: per-image real sizes of padded planes (ragged batching).
    wmax: rotated-window class for the image kernel (Pallas path only;
    None = derive from strength when host-known).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return optimize_batch_pallas(
            rows, strength, bleed, bpp=bpp, use_row_filters=use_row_filters,
            band_pad=band_pad, interpret=interpret,
            w_real=w_real, h_real=h_real, wmax=wmax)
    return optimize_batch(
        rows, strength, bleed, bpp=bpp, use_row_filters=use_row_filters,
        band_pad=band_pad, w_real=w_real, h_real=h_real)


__all__ = [
    "optimize_batch",
    "optimize_batch_auto",
    "optimize_batch_pallas",
    "optimize_plane_jax",
    "max_batch_for",
]
