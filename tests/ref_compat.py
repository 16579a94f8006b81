"""Import helpers for golden-parity tests against /root/reference.

The reference package imports CUDA/audio deps that are absent here
(flashinfer, torchaudio, librosa, onnxruntime, ...). For CPU parity tests we
only need the nn.Module definitions, so missing deps are stubbed with empty
module objects before import. The stubs raise only if actually CALLED.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"

_STUBS = (
    "flashinfer", "flashinfer.sampling",
    "torchaudio", "torchaudio.functional", "torchaudio.transforms",
    "torchaudio.compliance", "torchaudio.compliance.kaldi",
    "librosa", "librosa.filters",
    "onnxruntime", "onnx",
    "diffusers", "diffusers.models",
    "phonemizer", "phonemizer.backend",
    "soundfile",
    "s3tokenizer",
    "vector_quantize_pytorch",
    "inflect", "kanjize", "sudachipy",
    "pydub",
)


class _StubAttr:
    """Placeholder for anything pulled out of a stubbed module. Usable as a
    base class / decorator / callable; raises only when truly exercised."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return _StubAttr()

    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        return _StubAttr()

    def __mro_entries__(self, bases):  # allow `class X(Stub)` -> plain object
        return (object,)


def _stub(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    m.__path__ = []  # mark as package so submodule imports resolve
    m.__file__ = f"<stub {name}>"

    def _getattr(attr):
        if attr.startswith("__") and attr.endswith("__"):
            raise AttributeError(attr)
        return _StubAttr()

    m.__getattr__ = _getattr
    sys.modules[name] = m
    return m


def install_reference_stubs() -> None:
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    for name in _STUBS:
        if name not in sys.modules:
            _stub(name)
    # attributes referenced at import time
    lib = sys.modules["librosa"]
    filt = sys.modules["librosa.filters"]

    def _mel(sr=None, n_fft=None, n_mels=128, fmin=0.0, fmax=None, **kw):
        import numpy as np

        # slaney mel filterbank (what librosa.filters.mel computes) — needed
        # because parity tests exercise reference mel front-ends
        fmax = fmax or sr / 2.0

        def hz_to_mel(f):
            f = np.asarray(f, dtype=np.float64)
            f_sp = 200.0 / 3
            mels = f / f_sp
            min_log_hz = 1000.0
            min_log_mel = min_log_hz / f_sp
            logstep = np.log(6.4) / 27.0
            log_t = f >= min_log_hz
            mels = np.where(log_t,
                            min_log_mel + np.log(np.maximum(f, 1e-10)
                                                 / min_log_hz) / logstep,
                            mels)
            return mels

        def mel_to_hz(m):
            m = np.asarray(m, dtype=np.float64)
            f_sp = 200.0 / 3
            freqs = f_sp * m
            min_log_hz = 1000.0
            min_log_mel = min_log_hz / f_sp
            logstep = np.log(6.4) / 27.0
            log_t = m >= min_log_mel
            return np.where(log_t,
                            min_log_hz * np.exp(logstep * (m - min_log_mel)),
                            freqs)

        n_freqs = n_fft // 2 + 1
        fftfreqs = np.linspace(0, sr / 2.0, n_freqs)
        mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax),
                                      n_mels + 2))
        fdiff = np.diff(mel_f)
        ramps = mel_f[:, None] - fftfreqs[None, :]
        weights = np.zeros((n_mels, n_freqs))
        for i in range(n_mels):
            lower = -ramps[i] / fdiff[i]
            upper = ramps[i + 2] / fdiff[i + 1]
            weights[i] = np.maximum(0, np.minimum(lower, upper))
        enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
        return weights.astype(np.float32)

    filt.mel = _mel
    lib.filters = filt
    lib.resample = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("librosa.resample stub"))

    # minimal faithful diffusers.models.attention_processor.Attention
    # (self-attention path only; same parameter names as diffusers so
    # reference checkpoints map identically)
    ap = _stub("diffusers.models.attention_processor")
    try:
        import torch
        import torch.nn.functional as F
        from torch import nn

        class _DiffusersAttention(nn.Module):
            def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                         dim_head=64, dropout=0.0, bias=False,
                         upcast_attention=False, **kw):
                super().__init__()
                inner = heads * dim_head
                cross = cross_attention_dim or query_dim
                self.heads = heads
                self.to_q = nn.Linear(query_dim, inner, bias=bias)
                self.to_k = nn.Linear(cross, inner, bias=bias)
                self.to_v = nn.Linear(cross, inner, bias=bias)
                self.to_out = nn.ModuleList(
                    [nn.Linear(inner, query_dim), nn.Dropout(dropout)])

            def forward(self, hidden_states, encoder_hidden_states=None,
                        attention_mask=None, **kw):
                ctx = (encoder_hidden_states if encoder_hidden_states
                       is not None else hidden_states)
                B, T, _ = hidden_states.shape
                q = self.to_q(hidden_states)
                k = self.to_k(ctx)
                v = self.to_v(ctx)
                hd = q.shape[-1] // self.heads
                q = q.view(B, T, self.heads, hd).transpose(1, 2)
                k = k.view(B, -1, self.heads, hd).transpose(1, 2)
                v = v.view(B, -1, self.heads, hd).transpose(1, 2)
                if attention_mask is not None and attention_mask.ndim == 3:
                    attention_mask = attention_mask[:, None]
                out = F.scaled_dot_product_attention(
                    q, k, v, attn_mask=attention_mask)
                out = out.transpose(1, 2).reshape(B, T, -1)
                return self.to_out[1](self.to_out[0](out))

        ap.Attention = _DiffusersAttention
    except Exception:  # torch unavailable: leave the plain stub
        pass


def import_reference(dotted: str):
    """Import a reference module (e.g. 'vox_serve.model.qwen3_tts') with
    stubs installed, bypassing heavyweight package __init__ side effects is
    NOT attempted — missing deps must be covered by _STUBS instead."""
    install_reference_stubs()
    import importlib

    return importlib.import_module(dotted)
