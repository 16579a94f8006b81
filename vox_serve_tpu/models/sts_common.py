"""Shared logic for interleaved text/audio STS models (GLM-4-Voice,
Step-Audio-2): the LM emits one mixed stream where audio tokens live above
``audio_offset``; only audio tokens (minus the offset) feed the detokenizer
(reference glm_voice.py:566-592, step_audio_2.py:709-727)."""

from __future__ import annotations

import numpy as np

from ..requests import Request


class InterleavedAudioMixin:
    """Requires: self.audio_offset, self.stop_token_ids,
    self.effective_max_tokens."""

    audio_offset: int
    stop_token_ids: tuple[int, ...]

    def is_stop(self, token_ids: np.ndarray) -> bool:
        return int(token_ids[0]) in self.stop_token_ids

    def update_request_state(self, req: Request, sampled: np.ndarray) -> None:
        req.lm_output_tokens.append(sampled)
        tok = int(sampled[0])
        stop = tok in self.stop_token_ids
        if tok >= self.audio_offset and not stop:
            req.lm_output_audio_tokens.append(sampled)
        if stop:
            req.done_lm_generation = True
            req.finish_reason = "stop"
        elif self.hit_length_cap(req):
            req.done_lm_generation = True
            req.finish_reason = "length"
