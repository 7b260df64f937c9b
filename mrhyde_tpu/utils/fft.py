"""FFT/DFT of sensor time series for frequency-domain objectives.

Reference: src/interfaces/fftInterface.hpp:29-204 (FFTW wrapper used for
sensor 'fft'/'dft' output types in PostprocessManager). Here jnp.fft
runs on-device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["sensor_fft", "sensor_dft"]


def sensor_fft(series, dt: float = 1.0):
    """FFT of (n_sensors, n_times) sensor responses.

    Returns (freqs, complex spectrum (n_sensors, n_times))."""
    series = jnp.atleast_2d(jnp.asarray(series))
    spec = jnp.fft.fft(series, axis=1)
    freqs = np.fft.fftfreq(series.shape[1], d=dt)
    return freqs, spec


def sensor_dft(series, times, freqs):
    """Direct DFT at arbitrary (possibly non-uniform) sample times."""
    series = jnp.atleast_2d(jnp.asarray(series))   # (S, T)
    times = jnp.asarray(times)
    freqs = jnp.asarray(freqs)
    ker = jnp.exp(-2j * jnp.pi * freqs[:, None] * times[None, :])  # (F,T)
    return jnp.einsum("st,ft->sf", series.astype(jnp.complex64)
                      if series.dtype != jnp.complex128 else series, ker)
