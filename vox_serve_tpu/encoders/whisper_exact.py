"""Weight-exact audio-input encoders: GLM Whisper-VQ and Step-Audio-2.

Faithful JAX ports of the reference torch modules so the published
checkpoints map directly:

  * GLM Whisper-VQ (encoder/glm.py:217-327, zai-org/glm-4-voice-tokenizer):
    128-mel Whisper front-end (slaney filterbank), causal conv stem (left
    pad, x2 downsample), 16 pre-LN transformer layers (d1280/h20/ffn5120,
    k-proj bias-free) under a BLOCK-CAUSAL mask (attend to all past plus
    the full current 200-frame block), avg-pool x4 then nearest-codebook
    VQ (16384 x 1280) at layer 16 -> discrete speech tokens at 12.5 Hz.
  * Step-Audio-2 encoder + adaptor (encoder/step_audio_2.py:139-225,
    model/step_audio_2.py:218-243): Whisper-style bidirectional encoder
    (pad-masked), avg-pool x2, LayerNorm, then the conv/linear adaptor
    into LLM hidden space.

Both are host-side prefill-time ops (audio -> tokens/features once per
request), jitted per padded mel length.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm

NEG = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# Whisper mel front-end (librosa slaney filterbank — what whisper and both
# reference encoders use via librosa.filters.mel)
# ---------------------------------------------------------------------------
def slaney_mel_filters(n_mels: int, sr: int = 16000,
                       n_fft: int = 400) -> np.ndarray:
    """librosa.filters.mel(sr, n_fft, n_mels) — slaney scale + slaney area
    normalization. Returns (n_mels, n_fft//2 + 1)."""
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sr / 2, n_bins)

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10)
                                             / min_log_hz) / logstep, mels)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        freqs)

    mel_f = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0),
                                  n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def whisper_log_mel(audio: np.ndarray, n_mels: int = 128,
                    padding: int = 0) -> np.ndarray:
    """Whisper log-mel (encoder/step_audio_2.py:36-58 semantics): hann 400 /
    hop 160 centered STFT, drop the final frame, slaney mel, log10 with an
    8-dB-decade floor under the max, (x+4)/4. audio: (S,) -> (n_mels, F)."""
    x = np.asarray(audio, np.float32)
    if padding > 0:
        x = np.pad(x, (0, padding))
    n, hop = 400, 160
    window = np.hanning(n + 1)[:-1].astype(np.float32)
    xp = np.pad(x, (n // 2, n // 2), mode="reflect")
    F = (len(xp) - n) // hop + 1
    frames = np.lib.stride_tricks.sliding_window_view(xp, n)[::hop][:F]
    spec = np.abs(np.fft.rfft(frames * window, axis=-1)) ** 2  # (F, bins)
    spec = spec[:-1]  # reference drops the last frame (stft[..., :-1])
    mel = slaney_mel_filters(n_mels) @ spec.T  # (n_mels, F-1)
    log_spec = np.log10(np.clip(mel, 1e-10, None))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


# ---------------------------------------------------------------------------
# shared transformer pieces
# ---------------------------------------------------------------------------
def _linear(p, x):
    y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y


def _attn(lp, x, mask, heads):
    """Pre-LN whisper attention. mask: (T, T) additive or None."""
    B, T, D = x.shape
    hd = D // heads
    q = _linear(lp["q"], x).reshape(B, T, heads, hd)
    k = _linear(lp["k"], x).reshape(B, T, heads, hd)
    v = _linear(lp["v"], x).reshape(B, T, heads, hd)
    s = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
    if mask is not None:
        s = s + mask[None, None]
    a = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, -1), v)
    return _linear(lp["o"], a.reshape(B, T, D))


def _layer(lp, x, mask, heads):
    h = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
    x = x + _attn(lp, h, mask, heads)
    h = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
    return x + _linear(lp["fc2"], jax.nn.gelu(_linear(lp["fc1"], h),
                                              approximate=False))


def _causal_conv1d(w, b, x, stride):
    """CausalConv1d (encoder/glm.py:85-106): left pad dilation*(k-1)."""
    k = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (0, 0), (k - 1, 0))), w, (stride,), ((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + b[None, :, None]


def _conv1d(w, b, x, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, w, (stride,), ((padding, padding),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + b[None, :, None]


def _map_layer(sd, pre, names):
    q, k, v, o, ln1, fc1, fc2, ln2 = names

    def t(n, bias=True):
        p = {"w": jnp.asarray(np.asarray(sd[f"{pre}.{n}.weight"]),
                              jnp.float32)}
        if bias and f"{pre}.{n}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd[f"{pre}.{n}.bias"]),
                                 jnp.float32)
        return p

    def ln(n):
        return (jnp.asarray(np.asarray(sd[f"{pre}.{n}.weight"]), jnp.float32),
                jnp.asarray(np.asarray(sd[f"{pre}.{n}.bias"]), jnp.float32))

    l1w, l1b = ln(ln1)
    l2w, l2b = ln(ln2)
    return {"q": t(q), "k": t(k), "v": t(v), "o": t(o),
            "ln1_w": l1w, "ln1_b": l1b, "fc1": t(fc1), "fc2": t(fc2),
            "ln2_w": l2w, "ln2_b": l2b}


# ---------------------------------------------------------------------------
# GLM Whisper-VQ
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class GLMVQConfig:
    n_mels: int = 128
    d_model: int = 1280
    heads: int = 20
    ffn: int = 5120
    layers: int = 16              # quantize_position
    pool: int = 4                 # pooling_kernel_size at pooling_position
    block: int = 200              # quantize_causal_block_size
    vocab: int = 16384
    max_positions: int = 1500


def load_glm_vq_params(sd: dict, cfg: GLMVQConfig) -> dict:
    def arr(n):
        return jnp.asarray(np.asarray(sd[n]), jnp.float32)

    params = {
        "conv1_w": arr("conv1.weight"), "conv1_b": arr("conv1.bias"),
        "conv2_w": arr("conv2.weight"), "conv2_b": arr("conv2.bias"),
        "pos": arr("embed_positions.weight"),
        "codebook": arr("codebook.weight"),
        "layers": [_map_layer(
            sd, f"layers.{i}",
            ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
             "self_attn.out_proj", "self_attn_layer_norm", "fc1", "fc2",
             "final_layer_norm")) for i in range(cfg.layers)],
    }
    return params


def init_glm_vq_params(key: jax.Array, cfg: GLMVQConfig) -> dict:
    keys = iter(jax.random.split(key, 256))

    def lin(cin, cout, bias=True):
        p = {"w": jax.random.normal(next(keys), (cout, cin))
             / math.sqrt(cin)}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    D = cfg.d_model
    params = {
        "conv1_w": jax.random.normal(next(keys), (D, cfg.n_mels, 3)) * 0.05,
        "conv1_b": jnp.zeros((D,)),
        "conv2_w": jax.random.normal(next(keys), (D, D, 3)) * 0.02,
        "conv2_b": jnp.zeros((D,)),
        "pos": jax.random.normal(next(keys), (cfg.max_positions, D)) * 0.02,
        "codebook": jax.random.normal(next(keys), (cfg.vocab, D)),
        "layers": [{
            "q": lin(D, D), "k": lin(D, D, bias=False), "v": lin(D, D),
            "o": lin(D, D),
            "ln1_w": jnp.ones((D,)), "ln1_b": jnp.zeros((D,)),
            "fc1": lin(D, cfg.ffn), "fc2": lin(cfg.ffn, D),
            "ln2_w": jnp.ones((D,)), "ln2_b": jnp.zeros((D,)),
        } for _ in range(cfg.layers)],
    }
    return params


def glm_vq_encode(params: dict, cfg: GLMVQConfig, mel: jax.Array,
                  valid_frames: int | None = None) -> jax.Array:
    """mel (B, n_mels, T_mel) -> speech tokens (B, T_mel // 8) int32.

    Block-causal attention (encoder/glm.py:261-279): token i attends j iff
    j is in i's past OR inside i's current `block`-frame block, AND j is
    non-padding.
    """
    x = jax.nn.gelu(_causal_conv1d(params["conv1_w"], params["conv1_b"],
                                   mel, 1), approximate=False)
    x = jax.nn.gelu(_causal_conv1d(params["conv2_w"], params["conv2_b"],
                                   x, 2), approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T, D)
    B, T, D = x.shape
    x = x + params["pos"][:T][None]

    idx = np.arange(T)
    blk = idx // cfg.block
    allowed = (idx[:, None] >= idx[None, :]) | (blk[:, None] == blk[None, :])
    if valid_frames is not None:
        allowed = allowed & (idx[None, :] < valid_frames)
    mask = jnp.asarray(np.where(allowed, 0.0, NEG).astype(np.float32))

    for lp in params["layers"]:
        x = _layer(lp, x, mask, cfg.heads)

    # avg-pool x4 (pad tail with zeros like F.pad on (B, D, T))
    pad = (-T) % cfg.pool
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    x = x.reshape(B, (T + pad) // cfg.pool, cfg.pool, D).mean(axis=2)

    cb = params["codebook"]
    d = (jnp.sum(x * x, -1, keepdims=True) - 2 * x @ cb.T
         + jnp.sum(cb * cb, -1)[None, None])
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Step-Audio-2 encoder + adaptor
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class StepEncConfig:
    n_mels: int = 128
    d_model: int = 1280
    heads: int = 20
    layers: int = 32
    max_positions: int = 1500
    llm_dim: int = 3584
    adapter_hidden: int = 2048
    adapter_kernel: int = 7
    adapter_stride: int = 4


def load_step_encoder_params(sd: dict, cfg: StepEncConfig,
                             enc_prefix: str = "encoder.",
                             ada_prefix: str = "adapter.") -> dict:
    def arr(n):
        return jnp.asarray(np.asarray(sd[n]), jnp.float32)

    params = {
        "conv1_w": arr(f"{enc_prefix}conv1.weight"),
        "conv1_b": arr(f"{enc_prefix}conv1.bias"),
        "conv2_w": arr(f"{enc_prefix}conv2.weight"),
        "conv2_b": arr(f"{enc_prefix}conv2.bias"),
        "pos": arr(f"{enc_prefix}positional_embedding.weight"),
        "layers": [_map_layer(
            sd, f"{enc_prefix}blocks.{i}",
            ("attn.query", "attn.key", "attn.value", "attn.out",
             "attn_ln", "mlp.0", "mlp.2", "mlp_ln"))
            for i in range(cfg.layers)],
        "norm_w": arr(f"{enc_prefix}after_norm.weight"),
        "norm_b": arr(f"{enc_prefix}after_norm.bias"),
        "ada_conv_w": arr(f"{ada_prefix}conv.weight"),
        "ada_conv_b": arr(f"{ada_prefix}conv.bias"),
        "ada_l1": {"w": arr(f"{ada_prefix}linear1.weight"),
                   "b": arr(f"{ada_prefix}linear1.bias")},
        "ada_l2": {"w": arr(f"{ada_prefix}linear2.weight"),
                   "b": arr(f"{ada_prefix}linear2.bias")},
    }
    return params


def init_step_encoder_params(key: jax.Array, cfg: StepEncConfig) -> dict:
    keys = iter(jax.random.split(key, 512))

    def lin(cin, cout, bias=True):
        p = {"w": jax.random.normal(next(keys), (cout, cin))
             / math.sqrt(cin)}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    D = cfg.d_model
    return {
        "conv1_w": jax.random.normal(next(keys), (D, cfg.n_mels, 3)) * 0.05,
        "conv1_b": jnp.zeros((D,)),
        "conv2_w": jax.random.normal(next(keys), (D, D, 3)) * 0.02,
        "conv2_b": jnp.zeros((D,)),
        "pos": jax.random.normal(next(keys), (cfg.max_positions, D)) * 0.02,
        "layers": [{
            "q": lin(D, D), "k": lin(D, D, bias=False), "v": lin(D, D),
            "o": lin(D, D),
            "ln1_w": jnp.ones((D,)), "ln1_b": jnp.zeros((D,)),
            "fc1": lin(D, 4 * D), "fc2": lin(4 * D, D),
            "ln2_w": jnp.ones((D,)), "ln2_b": jnp.zeros((D,)),
        } for _ in range(cfg.layers)],
        "norm_w": jnp.ones((D,)), "norm_b": jnp.zeros((D,)),
        "ada_conv_w": jax.random.normal(
            next(keys), (D, D, cfg.adapter_kernel)) * 0.02,
        "ada_conv_b": jnp.zeros((D,)),
        "ada_l1": lin(D, cfg.adapter_hidden),
        "ada_l2": lin(cfg.adapter_hidden, cfg.llm_dim),
    }


def step_encode(params: dict, cfg: StepEncConfig, mel: jax.Array,
                valid_frames: int | None = None) -> jax.Array:
    """mel (B, n_mels, T_mel) -> encoder features (B, T_mel//4, d_model)
    (conv x2 downsample then avg-pool x2; reference
    encoder/step_audio_2.py:210-225)."""
    x = jax.nn.gelu(_conv1d(params["conv1_w"], params["conv1_b"], mel, 1, 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(params["conv2_w"], params["conv2_b"], x, 2, 1),
                    approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T//2, D)
    B, T, D = x.shape
    x = x + params["pos"][:T][None]

    mask = None
    if valid_frames is not None:
        T_in = mel.shape[-1]
        keep = np.arange(T_in) < valid_frames
        keep = keep[(T_in + 1) % 2::2][:T]  # conv stride-2 subsample
        key_mask = jnp.asarray(np.where(keep, 0.0, NEG).astype(np.float32))
        mask = jnp.broadcast_to(key_mask[None, :], (T, T))

    for lp in params["layers"]:
        x = _layer(lp, x, mask, cfg.heads)

    # avg-pool x2 (floor truncation, AvgPool1d default)
    T2 = (T // 2) * 2
    x = x[:, :T2].reshape(B, T2 // 2, 2, D).mean(axis=2)
    return layer_norm(x, params["norm_w"], params["norm_b"])


def step_adaptor(params: dict, cfg: StepEncConfig, x: jax.Array) -> jax.Array:
    """Encoder features -> LLM embedding space (model/step_audio_2.py:
    218-243): gelu(conv k7 s4 pad1) -> linear -> relu -> linear."""
    y = x.transpose(0, 2, 1)
    y = jax.lax.conv_general_dilated(
        y, params["ada_conv_w"], (cfg.adapter_stride,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH")) \
        + params["ada_conv_b"][None, :, None]
    y = jax.nn.gelu(y, approximate=False).transpose(0, 2, 1)
    y = jax.nn.relu(_linear(params["ada_l1"], y))
    return _linear(params["ada_l2"], y)
