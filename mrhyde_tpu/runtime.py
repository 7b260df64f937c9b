"""Runtime/dtype configuration.

The reference framework compiles with ScalarT = double by default and
float with MrHyDE_SINGLE_PRECISION (reference: src/preferences.hpp:40-44).
On TPU, float32 (with float64 emulation available through JAX x64 mode on
CPU backends for verification) is the native choice; all framework code
takes its working dtype from here rather than hard-coding.
"""

import jax
import jax.numpy as jnp

# FEM assembly einsums and Krylov dot products must be TRUE f32: at
# the TPU default matmul precision, f32 contractions lower to
# single-pass bf16 MXU passes whose ~1e-3 relative error swamps small
# residual entries (measured: fused-vs-general residual disagreement
# 1e-3..4e-2, Newton residual norms FLOORED at the noise level on the
# NX=256 NS channel). HIGHEST selects the exact 3-pass f32
# decomposition — the FLOPs live on the hot fused VPU path anyway, so
# the 3x MXU cost lands only on the general path and postprocessing.
jax.config.update("jax_default_matmul_precision", "highest")


def fp64(enable: bool = True) -> None:
    """Enable (or disable) 64-bit mode globally. Call before any tracing."""
    jax.config.update("jax_enable_x64", enable)


def default_dtype():
    """The current default floating dtype (f64 iff x64 mode is on)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
