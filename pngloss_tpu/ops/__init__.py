from pngloss_tpu.ops.optimize import optimize_batch, optimize_plane_jax

__all__ = ["optimize_batch", "optimize_plane_jax"]
