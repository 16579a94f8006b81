from .mel import log_mel_spectrogram, MelConfig  # noqa: F401
from .speaker import SpeakerEncoderConfig, init_speaker_encoder, speaker_embed  # noqa: F401
