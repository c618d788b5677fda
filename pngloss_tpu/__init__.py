"""pngloss-tpu: a TPU-native lossy PNG compression framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of foobaz/pngloss:
quantize PNG pixel data so filter residuals compress better under zlib, using
Sierra error diffusion, an adaptive frequency-derived symbol table, and an
exhaustive per-row search over the five PNG filters — reformulated as a
batched wavefront scan that processes thousands of images at once on TPU.
"""

from pngloss_tpu.version import __version__

__all__ = ["__version__"]
