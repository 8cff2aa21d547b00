"""Golden tests for the matmul-DFT facade (helicon_tpu.core.fft).

The facade normally only takes the matmul path on TPU; here we force it
via monkeypatching use_matmul_dft and compare against jnp.fft oracles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import helicon_tpu.core.fft as hfft


@pytest.fixture
def force_matmul(monkeypatch):
    monkeypatch.setattr(hfft, "use_matmul_dft", lambda: True)


rng = np.random.default_rng(0)


def test_fft_ifft_axis(force_matmul):
    x = rng.standard_normal((6, 10)).astype(np.float32)
    got = hfft.fft(x, axis=-1)
    ref = np.fft.fft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)
    back = hfft.ifft(got, axis=-1)
    np.testing.assert_allclose(np.real(np.asarray(back)), x, atol=1e-4)


def test_fftn_2d_3d(force_matmul):
    for shape in [(8, 12), (6, 8, 10)]:
        x = rng.standard_normal(shape).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(hfft.fftn(x)), np.fft.fftn(x), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(hfft.ifftn(np.fft.fftn(x))), x, atol=1e-3
        )


def test_rfftn_irfftn_roundtrip(force_matmul):
    for shape in [(8, 12), (6, 8, 10), (7, 9)]:
        x = rng.standard_normal(shape).astype(np.float32)
        half = hfft.rfftn(x)
        np.testing.assert_allclose(
            np.asarray(half), np.fft.rfftn(x), atol=1e-3
        )
        back = hfft.irfftn(half, s=shape)
        np.testing.assert_allclose(np.asarray(back), x, atol=1e-3)


def test_rfft2_irfft2(force_matmul):
    x = rng.standard_normal((4, 10, 12)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(hfft.rfft2(x)), np.fft.rfft2(x), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(hfft.irfft2(np.fft.rfft2(x), s=(10, 12))), x, atol=1e-3
    )


def test_czt_matmul_path_matches_fft_path(monkeypatch):
    import importlib

    czt_mod = importlib.import_module("helicon_tpu.core.czt")

    x = rng.standard_normal((12, 16)).astype(np.float32)
    ref = np.asarray(czt_mod.czt(x, m=10, f0=-0.3, df=0.05, axis=-1))
    import helicon_tpu.core.fft as fftmod

    monkeypatch.setattr(fftmod, "use_matmul_dft", lambda: True)
    got = np.asarray(czt_mod.czt(x, m=10, f0=-0.3, df=0.05, axis=-1))
    np.testing.assert_allclose(got, ref, atol=1e-3)
