from .stft import stft_magnitude, stft, istft, hann_window
from .mel import mel_filterbank
from .griffin_lim import griffin_lim, mel_to_stft
