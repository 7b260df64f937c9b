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

# Persistent compilation cache: deck-CLI runs are separate processes,
# and on the TPU-tunnel setup a cold jit program costs ~45s-6min of
# remote compile — without an on-disk cache every `python -m
# mrhyde_tpu.driver deck.yaml` repays it (measured ~9 min cold vs 66 s
# warm for a 40x40 steady thermal deck at round 4). The reference has
# no compile step at all; this is the XLA-world equivalent of shipping
# a prebuilt binary. Opt out with MRHYDE_NO_COMPILE_CACHE=1.
import os as _os

if _os.environ.get("MRHYDE_NO_COMPILE_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      _os.environ.get("MRHYDE_COMPILE_CACHE",
                                      "/tmp/mrhyde_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fp64(enable: bool = True) -> None:
    """Enable (or disable) 64-bit mode globally. Call before any tracing."""
    jax.config.update("jax_enable_x64", enable)


def default_dtype():
    """The current default floating dtype (f64 iff x64 mode is on)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
