"""Unit tests: KL expansion, FFT, MLS interpolation, profiling."""

import numpy as np

from mrhyde_tpu.utils.fft import sensor_dft, sensor_fft
from mrhyde_tpu.utils.klexpansion import KLExpansion
from mrhyde_tpu.utils.data_import import mls_interpolate, nearest_neighbor
from mrhyde_tpu.utils.profiling import reset_timers, timed, timer_report


def test_kl_expansion_roots_and_orthonormality():
    kl = KLExpansion(5, domain_length=1.0, correlation_length=0.5,
                     sigma=1.0)
    # roots satisfy the characteristic equation
    assert np.allclose(kl._f(kl.omega), 0.0, atol=1e-6)
    # eigenvalues decreasing and positive
    assert (np.diff(kl.lam) < 0).all() and (kl.lam > 0).all()
    # eigenfunctions approximately orthonormal on [0, 1]
    x = np.linspace(0, 1, 4001)
    f0 = kl.eigenfunction(0, x)
    f1 = kl.eigenfunction(1, x)
    assert abs(np.trapezoid(f0 * f0, x) - 1.0) < 1e-3
    assert abs(np.trapezoid(f0 * f1, x)) < 1e-6


def test_fft_recovers_tone():
    t = np.arange(64) * 0.1
    series = np.sin(2 * np.pi * 1.25 * t)[None, :]
    freqs, spec = sensor_fft(series, dt=0.1)
    peak = np.abs(np.asarray(spec))[0]
    assert np.isclose(abs(freqs[int(np.argmax(peak))]), 1.25)
    spec2 = sensor_dft(series, t, freqs)
    assert np.allclose(np.abs(np.asarray(spec2))[0], peak, atol=1e-3)


def test_mls_reproduces_linear_field():
    rng = np.random.RandomState(0)
    cloud = rng.rand(200, 2)
    vals = 2.0 + 3.0 * cloud[:, 0] - cloud[:, 1]
    q = rng.rand(10, 2) * 0.8 + 0.1
    out = mls_interpolate(cloud, vals, q, n_neighbors=12, order=1)
    np.testing.assert_allclose(out, 2.0 + 3.0 * q[:, 0] - q[:, 1],
                               rtol=1e-6, atol=1e-8)
    nn = nearest_neighbor(cloud, cloud[:3] + 1e-9)
    assert (nn == [0, 1, 2]).all()


def test_timers():
    reset_timers()
    with timed("unit"):
        pass
    assert "unit" in timer_report()
