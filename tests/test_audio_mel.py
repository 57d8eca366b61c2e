"""Audio frontend tests: the load-bearing '9 examples of 64x64' invariant,
filterbank properties, tone localization, and numpy<->jnp parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from diff_sal_tpu.audio import mel


def test_mel_matrix_properties():
    m = mel.mel_matrix()
    assert m.shape == (257, 64)
    assert (m[0] == 0).all()  # DC excluded
    assert (m >= 0).all()
    # triangles overlap: most interior FFT bins inside [125, 7500] are covered
    bins_hz = np.linspace(0, 8000, 257)
    inside = (bins_hz > 200) & (bins_hz < 7000)
    assert (m[inside].sum(axis=1) > 0).all()


def test_reference_window_invariant_9_examples():
    """35280 samples at 22050 Hz -> resample 16k -> 158 mel frames -> exactly
    9 examples of (64, 64) — the alignment the decoder's audio path depends
    on (SURVEY.md §7.3)."""
    wave = np.random.RandomState(0).randn(mel.MAX_AUDIO_WIN) * 0.1
    ex = mel.waveform_to_examples_np(wave, 22050)
    assert ex.shape == (9, 64, 64)


def test_16k_direct_path_frame_math():
    wave = np.zeros(25600)
    lm = mel.log_mel_spectrogram_np(wave)
    assert lm.shape == (158, 64)
    np.testing.assert_allclose(lm, np.log(mel.LOG_OFFSET))


def test_tone_localizes_in_mel():
    sr = 16000
    t = np.arange(25600) / sr
    wave = np.sin(2 * np.pi * 1000 * t)
    lm = mel.log_mel_spectrogram_np(wave)
    peak_bin = lm.mean(axis=0).argmax()
    # 1 kHz should land in the mel bin whose center is nearest 1 kHz
    centers_mel = np.linspace(
        1127 * np.log(1 + 125 / 700), 1127 * np.log(1 + 7500 / 700), 66
    )[1:-1]
    centers_hz = 700 * (np.exp(centers_mel / 1127) - 1)
    expect = np.abs(centers_hz - 1000).argmin()
    assert abs(int(peak_bin) - int(expect)) <= 1


def test_device_frontend_matches_host():
    rng = np.random.RandomState(1)
    wave = rng.randn(2, 25600).astype(np.float32) * 0.1
    dev = np.asarray(mel.log_mel_examples(jnp.asarray(wave)))
    host = np.stack([mel.waveform_to_examples_np(w, 16000) for w in wave])
    assert dev.shape == (2, 9, 64, 64)
    np.testing.assert_allclose(dev, host, atol=2e-4)


def test_device_full_frontend_shape():
    wave = jnp.zeros((1, 25600))
    out = mel.device_audio_frontend(wave)
    assert out.shape == (1, 9, 112, 192, 1)


def test_center_pad_and_repeat():
    ex = mel.center_pad_excerpt(np.ones(100))
    assert ex.shape == (35280,)
    assert ex.sum() == 100
    lo = 35280 // 2 - 50
    assert (ex[lo : lo + 100] == 1).all()

    e = np.arange(4)[:, None, None] * np.ones((1, 2, 2))
    r = mel.repeat_to_audio_len(e, 9)
    assert r.shape == (9, 2, 2)
    # repeat_interleave(2) of [0,1,2,3] -> [0,0,1,1,2,2,3,3] + first 1 -> +[0]
    np.testing.assert_array_equal(r[:, 0, 0], [0, 0, 1, 1, 2, 2, 3, 3, 0])


def test_model_audio_shape_and_dtype():
    ex = np.random.RandomState(2).randn(9, 64, 64)
    out = mel.examples_to_model_audio(ex)
    assert out.shape == (9, 112, 192, 1)
    assert out.dtype == np.float32
