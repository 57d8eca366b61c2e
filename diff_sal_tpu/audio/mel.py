"""VGGish log-mel audio frontend — host (numpy) and on-device (jnp) paths.

Behavioral mirror of reference `datasets/torchvggish/` (mel_features.py,
vggish_input.py, vggish_params.py) with the repo's modified framing constants
(EXAMPLE_WINDOW 0.64s / HOP 0.11s -> 64x64 examples, vggish_params.py:34-35):

  wave @16kHz -> STFT (win 400, hop 160, periodic Hann, |rfft 512|)
             -> HTK mel filterbank, 64 bins, 125-7500 Hz
             -> log(mel + 0.01)
             -> frame into examples of 64 frames, hop 11  (-> N x 64 x 64)

plus the saliency_db packaging (saliency_db.py:449-497, 343-354):
  center-pad wave excerpt into max_audio_win = 22050/10*16 samples,
  repeat/trim examples to exactly 9, bilinear-resize each to (112, 192)
  -> model input (9, 112, 192, 1).

The jnp path (`log_mel_examples`, `device_audio_frontend`) runs the same
math with static shapes so audio preprocessing can fuse into the on-device
input pipeline — the TPU-native replacement for the reference's
numpy-on-CPU-workers frontend. Resampling to 16 kHz (resampy in the
reference) is scipy polyphase here (different anti-alias filter tails).
"""

from __future__ import annotations

import functools

import numpy as np

SAMPLE_RATE = 16000
STFT_WINDOW = 400  # 0.025 s
STFT_HOP = 160  # 0.010 s
FFT_LENGTH = 512
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_WINDOW = 64  # frames  (0.64 s)
EXAMPLE_HOP = 11  # frames  (0.11 s)
AUDIO_LEN = 9  # examples per clip
MAX_AUDIO_WIN = int(22050 / 10 * 16)  # center-pad target, 35280 samples
MODEL_AUDIO_HW = (112, 192)
# 16 kHz equivalent of the reference's 35280-sample pad target at the
# corpus's native 22050 Hz (saliency_db.py:477-487): the packed pipeline
# resamples waves to 16 kHz once at pack time, so excerpts are padded into
# this many samples before the on-device frontend (which then yields exactly
# AUDIO_LEN examples: 158 STFT frames -> 9 hops of 11).
PACKED_WAVE_LEN = MAX_AUDIO_WIN * SAMPLE_RATE // 22050  # 25600


def periodic_hann(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi / n * np.arange(n))


@functools.lru_cache(maxsize=None)
def mel_matrix(
    num_mel_bins: int = NUM_MEL_BINS,
    num_spectrogram_bins: int = FFT_LENGTH // 2 + 1,
    sample_rate: int = SAMPLE_RATE,
    lower_hz: float = MEL_MIN_HZ,
    upper_hz: float = MEL_MAX_HZ,
) -> np.ndarray:
    """HTK triangular mel weights, (num_spectrogram_bins, num_mel_bins);
    DC bin zeroed (reference mel_features.py:114-189)."""
    to_mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)  # noqa: E731
    bins_hz = np.linspace(0.0, sample_rate / 2.0, num_spectrogram_bins)
    bins_mel = to_mel(bins_hz)
    edges = np.linspace(to_mel(lower_hz), to_mel(upper_hz), num_mel_bins + 2)
    lower, center, upper = edges[:-2], edges[1:-1], edges[2:]
    lower_slope = (bins_mel[:, None] - lower) / (center - lower)
    upper_slope = (upper - bins_mel[:, None]) / (upper - center)
    w = np.maximum(0.0, np.minimum(lower_slope, upper_slope))
    w[0, :] = 0.0
    return w


def _frame_np(x: np.ndarray, window: int, hop: int) -> np.ndarray:
    n = 1 + (len(x) - window) // hop
    idx = np.arange(window)[None, :] + hop * np.arange(n)[:, None]
    return x[idx]


def log_mel_spectrogram_np(wave16k: np.ndarray) -> np.ndarray:
    """(num_samples,) -> (num_frames, 64) log-mel, reference math."""
    frames = _frame_np(np.asarray(wave16k, np.float64), STFT_WINDOW, STFT_HOP)
    spec = np.abs(np.fft.rfft(frames * periodic_hann(STFT_WINDOW), FFT_LENGTH))
    mel = spec @ mel_matrix()
    return np.log(mel + LOG_OFFSET)


def waveform_to_examples_np(wave: np.ndarray, sample_rate: int) -> np.ndarray:
    """wave (any sr, mono or multichannel) -> (N, 64, 64) examples
    (reference vggish_input.py:30-82)."""
    wave = np.asarray(wave, np.float64)
    if wave.ndim > 1:
        wave = wave.mean(axis=1)
    if sample_rate != SAMPLE_RATE:
        from scipy.signal import resample_poly

        g = np.gcd(int(sample_rate), SAMPLE_RATE)
        wave = resample_poly(wave, SAMPLE_RATE // g, int(sample_rate) // g)
    log_mel = log_mel_spectrogram_np(wave)
    if len(log_mel) < EXAMPLE_WINDOW:
        raise ValueError(
            f"wave too short: {len(log_mel)} mel frames < {EXAMPLE_WINDOW}"
        )
    n = 1 + (len(log_mel) - EXAMPLE_WINDOW) // EXAMPLE_HOP
    idx = (
        np.arange(EXAMPLE_WINDOW)[None, :]
        + EXAMPLE_HOP * np.arange(n)[:, None]
    )
    return log_mel[idx]


def center_pad_excerpt(excerpt: np.ndarray, total: int = MAX_AUDIO_WIN) -> np.ndarray:
    """Zero-pad a wave excerpt centered in `total` samples
    (reference saliency_db.py:477-487)."""
    out = np.zeros(total, np.float64)
    v = len(excerpt)
    if v == 0:
        return out
    if v > total:  # over-long excerpts keep the center
        start = (v - total) // 2
        return np.asarray(excerpt[start : start + total], np.float64)
    lo = total // 2 - v // 2
    out[lo : lo + v] = excerpt
    return out


def repeat_to_audio_len(examples: np.ndarray, audio_len: int = AUDIO_LEN):
    """repeat_interleave + tail-cat to exactly `audio_len` examples
    (reference saliency_db.py:489-497)."""
    n = examples.shape[0]
    if n != audio_len:
        rep = audio_len // n
        if rep != 0:
            examples = np.repeat(examples, rep, axis=0)
        examples = np.concatenate([examples, examples[: audio_len % n]], axis=0)
    return examples[:audio_len]


def examples_to_model_audio(examples: np.ndarray, hw=None) -> np.ndarray:
    """(N, 64, 64) -> (9, H, W, 1) float32 model input: repeat/trim to 9
    + bilinear resize per example (reference saliency_db.py:343-354 audio
    transform Resize((112, 192))). `hw` defaults to the reference (112, 192);
    smaller sizes support reduced-resolution video configs (the audio grid
    must stay 16x the coarsest video scale)."""
    import cv2

    hw = tuple(hw) if hw is not None else MODEL_AUDIO_HW
    examples = repeat_to_audio_len(np.asarray(examples))
    out = np.empty((AUDIO_LEN, *hw, 1), np.float32)
    for i, ex in enumerate(examples):
        out[i, :, :, 0] = cv2.resize(
            ex.astype(np.float32),
            (hw[1], hw[0]),
            interpolation=cv2.INTER_LINEAR,
        )
    return out


def clip_audio_to_model_input(
    wave: np.ndarray, sample_rate: int, is_silent: bool = False, hw=None
) -> np.ndarray:
    """Full host path for one clip excerpt -> (9, 112, 192, 1) by default."""
    if is_silent:
        ex = waveform_to_examples_np(np.zeros(MAX_AUDIO_WIN), sample_rate)
    else:
        ex = waveform_to_examples_np(center_pad_excerpt(wave), sample_rate)
    return examples_to_model_audio(ex, hw)


# ---------------------------------------------------------------------------
# On-device (jnp) frontend — static shapes, jittable, batched.
# ---------------------------------------------------------------------------


def log_mel_examples(wave16k):
    """jnp: (B, num_samples) fixed-length 16 kHz waves -> (B, N, 64, 64)."""
    import jax.numpy as jnp

    num_samples = wave16k.shape[-1]
    n_frames = 1 + (num_samples - STFT_WINDOW) // STFT_HOP
    idx = (
        np.arange(STFT_WINDOW)[None, :] + STFT_HOP * np.arange(n_frames)[:, None]
    )
    frames = wave16k[..., idx] * jnp.asarray(
        periodic_hann(STFT_WINDOW), jnp.float32
    )
    spec = jnp.abs(jnp.fft.rfft(frames, FFT_LENGTH))
    mel = spec @ jnp.asarray(mel_matrix(), jnp.float32)
    log_mel = jnp.log(mel + LOG_OFFSET)
    n_ex = 1 + (n_frames - EXAMPLE_WINDOW) // EXAMPLE_HOP
    eidx = (
        np.arange(EXAMPLE_WINDOW)[None, :] + EXAMPLE_HOP * np.arange(n_ex)[:, None]
    )
    return log_mel[..., eidx, :]


def device_audio_frontend(wave16k, hw=None):
    """jnp: (B, num_samples) -> (B, 9, H, W, 1) model audio, fully fused
    on device (repeat/trim assumes the standard PACKED_WAVE_LEN=25600-sample
    excerpt that yields exactly 9 examples). `hw` defaults to the reference
    (112, 192) audio transform size (saliency_db.py:343-354)."""
    import jax.numpy as jnp

    from diff_sal_tpu.ops.resize import bilinear_resize

    ex = log_mel_examples(wave16k)  # (B, N, 64, 64)
    n = ex.shape[1]
    if n != AUDIO_LEN:
        rep = AUDIO_LEN // n
        if rep:
            ex = jnp.repeat(ex, rep, axis=1)
        ex = jnp.concatenate([ex, ex[:, : AUDIO_LEN % n]], axis=1)
        ex = ex[:, :AUDIO_LEN]
    ex = ex[..., None]  # (B, 9, 64, 64, 1)
    return bilinear_resize(ex, tuple(hw) if hw is not None else MODEL_AUDIO_HW)
