from .stft import stft_magnitude, stft, istft, hann_window
from .mel import mel_filterbank
from .griffin_lim import griffin_lim, mel_to_stft
from .attention import (
    multi_head_attention,
    set_attention_backend,
    get_attention_backend,
)
from .spec_augment import spec_augment
