from dissc_tpu.audio.mel import mel_spectrogram, mel_filterbank, stft_magnitude
