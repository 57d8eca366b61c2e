from diff_sal_tpu.audio.mel import (  # noqa: F401
    examples_to_model_audio,
    log_mel_spectrogram_np,
    waveform_to_examples_np,
)
