from .transforms import MelSpec, wav_to_mel, mel_to_wav, denormalize_spectrogram, normalize_spectrogram
