"""HiFT (NSF-HiFiGAN + ISTFTNet) vocoder in JAX.

Re-implementation of the reference's HiFTGenerator (tokenizer/hifigan.py:
429-665), the mel->waveform stage shared by CosyVoice2, Chatterbox, GLM-4-Voice
and Step-Audio-2: ConvRNN F0 predictor -> harmonic sine source (NSF) ->
upsampling HiFiGAN trunk with Snake ResBlocks and STFT-domain source
injection -> ISTFT head (mag = exp, phase = sin), hann window n_fft 16 hop 4.

Deterministic serving: the reference adds Gaussian noise to the sine source
and random initial harmonic phases; we default both to zero (pass a rng to
restore stochasticity). Streaming keeps source continuity via a cache of the
previously generated source excitation (reference forward_chunk semantics).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .layers import (conv1d, conv_transpose1d, init_conv1d,
                     init_conv_transpose1d, snake)


@dataclasses.dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple[int, ...] = (8, 5, 3)
    upsample_kernel_sizes: tuple[int, ...] = (16, 11, 7)
    n_fft: int = 16
    hop_len: int = 4
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    source_resblock_kernel_sizes: tuple[int, ...] = (7, 7, 11)
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def total_upsample(self) -> int:
        return int(math.prod(self.upsample_rates)) * self.hop_len  # 480


def _get_padding(kernel, dilation=1):
    return (kernel * dilation - dilation) // 2


def init_hift(cfg: HiFTConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 256))

    def nk():
        return next(keys)

    def resblock(ch, kernel, dilations):
        return {
            "convs1": [init_conv1d(nk(), ch, ch, kernel) for _ in dilations],
            "convs2": [init_conv1d(nk(), ch, ch, kernel) for _ in dilations],
            "alpha1": [jnp.ones((ch,)) for _ in dilations],
            "alpha2": [jnp.ones((ch,)) for _ in dilations],
        }

    p: dict = {
        "f0_convs": [init_conv1d(nk(), cfg.in_channels if i == 0 else
                                 cfg.f0_cond_channels, cfg.f0_cond_channels, 3)
                     for i in range(5)],
        "f0_out_w": jax.random.normal(nk(), (cfg.f0_cond_channels, 1)) * 0.02,
        "f0_out_b": jnp.zeros((1,)),
        "source_linear_w": jax.random.normal(
            nk(), (cfg.nb_harmonics + 1, 1)) * 0.3,
        "source_linear_b": jnp.zeros((1,)),
        "conv_pre": init_conv1d(nk(), cfg.in_channels, cfg.base_channels, 7),
        "ups": [], "source_downs": [], "source_resblocks": [], "resblocks": [],
    }
    down_cum = np.cumprod([1] + list(cfg.upsample_rates[::-1][:-1]))[::-1]
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cin = cfg.base_channels // (2 ** i)
        cout = cfg.base_channels // (2 ** (i + 1))
        p["ups"].append(init_conv_transpose1d(nk(), cin, cout, k))
        d = int(down_cum[i])
        if d == 1:
            p["source_downs"].append(init_conv1d(nk(), cfg.n_fft + 2, cout, 1))
        else:
            p["source_downs"].append(
                init_conv1d(nk(), cfg.n_fft + 2, cout, d * 2))
        p["source_resblocks"].append(
            resblock(cout, cfg.source_resblock_kernel_sizes[i],
                     cfg.resblock_dilations[i]))
        for k2, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations):
            p["resblocks"].append(resblock(cout, k2, dil))
    final_ch = cfg.base_channels // (2 ** len(cfg.upsample_rates))
    p["conv_post"] = init_conv1d(nk(), final_ch, cfg.n_fft + 2, 7)
    return p


def _resblock(p, x, kernel, dilations):
    for i, dil in enumerate(dilations):
        xt = snake(x, p["alpha1"][i])
        xt = conv1d(p["convs1"][i], xt, padding=_get_padding(kernel, dil),
                    dilation=dil)
        xt = snake(xt, p["alpha2"][i])
        xt = conv1d(p["convs2"][i], xt, padding=_get_padding(kernel, 1))
        x = x + xt
    return x


def _f0_predictor(p, mel):
    x = mel
    for conv in p["f0_convs"]:
        x = conv1d(conv, x, padding=1)
        x = jax.nn.elu(x)
    f0 = jnp.abs(x.transpose(0, 2, 1) @ p["f0_out_w"] + p["f0_out_b"])
    return f0[:, :, 0]  # (B, T)


def _sine_source(p, cfg: HiFTConfig, f0_frames: jax.Array,
                 rng: jax.Array | None) -> jax.Array:
    """f0_frames: (B, T) Hz -> source excitation (B, 1, T * total_upsample)."""
    B, T = f0_frames.shape
    up = cfg.total_upsample
    f0 = jnp.repeat(f0_frames, up, axis=1)  # (B, S) nearest upsample
    harmonics = jnp.arange(1, cfg.nb_harmonics + 2, dtype=jnp.float32)
    rad = (f0[:, :, None] * harmonics[None, None, :]) / cfg.sampling_rate
    phase = 2.0 * jnp.pi * jnp.cumsum(jnp.mod(rad, 1.0), axis=1)
    sines = cfg.nsf_alpha * jnp.sin(phase)  # (B, S, H+1)
    uv = (f0 > cfg.nsf_voiced_threshold).astype(jnp.float32)[:, :, None]
    if rng is not None:
        noise_amp = uv * 0.003 + (1 - uv) * cfg.nsf_alpha / 3
        sines = sines * uv + noise_amp * jax.random.normal(rng, sines.shape)
    else:
        sines = sines * uv
    merged = jnp.tanh(sines @ p["source_linear_w"] + p["source_linear_b"])
    return merged.transpose(0, 2, 1)  # (B, 1, S)


def _stft_18(cfg: HiFTConfig, s: jax.Array) -> jax.Array:
    """torch.stft(center=True) of the source: (B, S) -> (B, n_fft+2, S/hop+1)
    with real/imag stacked."""
    n, hop = cfg.n_fft, cfg.hop_len
    window = jnp.asarray(np.hanning(n + 1)[:-1].astype(np.float32))
    pad = n // 2
    sp = jnp.pad(s, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (sp.shape[1] - n) // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n)[None, :]
    frames = sp[:, idx] * window[None, None, :]        # (B, F, n)
    spec = jnp.fft.rfft(frames, axis=-1)               # (B, F, n/2+1)
    return jnp.concatenate([spec.real, spec.imag],
                           axis=-1).transpose(0, 2, 1)  # (B, n+2, F)


def _istft(cfg: HiFTConfig, mag: jax.Array, phase: jax.Array) -> jax.Array:
    """(B, n/2+1, F) mag/phase -> (B, samples): overlap-add inverse STFT."""
    n, hop = cfg.n_fft, cfg.hop_len
    window = jnp.asarray(np.hanning(n + 1)[:-1].astype(np.float32))
    mag = jnp.clip(mag, max=1e2)
    comp = mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)
    frames = jnp.fft.irfft(comp.transpose(0, 2, 1), n=n, axis=-1)  # (B, F, n)
    frames = frames * window[None, None, :]
    B, F, _ = frames.shape
    out_len = n + hop * (F - 1)
    idx = jnp.arange(F)[:, None] * hop + jnp.arange(n)[None, :]   # (F, n)
    sig = jnp.zeros((B, out_len)).at[:, idx.reshape(-1)].add(
        frames.reshape(B, -1))
    win_sq = jnp.square(window)
    denom = jnp.zeros((out_len,)).at[idx.reshape(-1)].add(
        jnp.tile(win_sq, (F,)))
    denom = jnp.where(denom > 1e-8, denom, 1.0)
    sig = sig / denom[None, :]
    pad = n // 2
    return sig[:, pad:-pad]


def hift_decode(params: dict, cfg: HiFTConfig, mel: jax.Array,
                source_cache: jax.Array | None = None,
                rng: jax.Array | None = None
                ) -> tuple[jax.Array, jax.Array]:
    """mel (B, 80, T) -> (waveform (B, T * 480), source (B, 1, T * 480)).

    source_cache (B, 1, S_prev): excitation generated for previous chunks —
    overwrites the head of this chunk's source for phase continuity
    (reference forward_chunk, hifigan.py:640-665).
    """
    f0 = _f0_predictor(params, mel)   # (B, T)
    s = _sine_source(params, cfg, f0, rng)             # (B, 1, S)
    if source_cache is not None and source_cache.shape[2] > 0:
        keep = source_cache.shape[2]
        s = jnp.concatenate([source_cache, s[:, :, keep:]], axis=2)

    s_stft = _stft_18(cfg, s[:, 0])                    # (B, 18, F)

    down_cum = np.cumprod([1] + list(cfg.upsample_rates[::-1][:-1]))[::-1]
    x = conv1d(params["conv_pre"], mel, padding=3)
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        x = conv_transpose1d(params["ups"][i], x, stride=u,
                             padding=(k - u) // 2)
        if i == len(cfg.upsample_rates) - 1:
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 0)), mode="reflect")
        d = int(down_cum[i])
        if d == 1:
            si = conv1d(params["source_downs"][i], s_stft)
        else:
            si = conv1d(params["source_downs"][i], s_stft, stride=d,
                        padding=d // 2)
        si = _resblock(params["source_resblocks"][i], si,
                       cfg.source_resblock_kernel_sizes[i],
                       cfg.resblock_dilations[i])
        x = x + si
        xs = None
        for j in range(num_kernels):
            r = _resblock(params["resblocks"][i * num_kernels + j], x,
                          cfg.resblock_kernel_sizes[j],
                          cfg.resblock_dilations[j])
            xs = r if xs is None else xs + r
        x = xs / num_kernels

    x = jax.nn.leaky_relu(x)
    x = conv1d(params["conv_post"], x, padding=3)
    half = cfg.n_fft // 2 + 1
    mag = jnp.exp(x[:, :half, :])
    phase = jnp.sin(x[:, half:, :])
    wav = _istft(cfg, mag, phase)
    wav = jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)
    return wav, s


def load_hift_params(sd: dict, cfg: HiFTConfig, prefix: str = "") -> dict:
    """Map the published hift.pt checkpoint (HiFTGenerator.state_dict(),
    reference tokenizer/hifigan.py:429-531; the same module ships with
    CosyVoice2, Chatterbox s3gen under ``mel2wav.``, GLM and Step-Audio-2)
    onto the JAX pytree. torch weight_norm (weight_g, weight_v) pairs are
    folded into plain weights."""
    from .layers import fold_weight_norm

    def arr(name):
        return np.asarray(sd[prefix + name])

    def wn_conv(name):
        # accept old-style (weight_g/weight_v), parametrized
        # (parametrizations.weight.original0/1) and already-folded weights
        if prefix + name + ".weight_g" in sd:
            w = fold_weight_norm(arr(f"{name}.weight_g"),
                                 arr(f"{name}.weight_v"))
        elif prefix + name + ".parametrizations.weight.original0" in sd:
            w = fold_weight_norm(
                arr(f"{name}.parametrizations.weight.original0"),
                arr(f"{name}.parametrizations.weight.original1"))
        else:
            w = arr(f"{name}.weight")
        p = {"w": jnp.asarray(w, jnp.float32)}
        if prefix + name + ".bias" in sd:
            p["b"] = jnp.asarray(arr(f"{name}.bias"), jnp.float32)
        return p

    def conv(name):
        p = {"w": jnp.asarray(arr(f"{name}.weight"), jnp.float32)}
        if prefix + name + ".bias" in sd:
            p["b"] = jnp.asarray(arr(f"{name}.bias"), jnp.float32)
        return p

    def resblock(name, n=3):
        return {
            "convs1": [wn_conv(f"{name}.convs1.{j}") for j in range(n)],
            "convs2": [wn_conv(f"{name}.convs2.{j}") for j in range(n)],
            "alpha1": [jnp.asarray(arr(f"{name}.activations1.{j}.alpha"
                                       ).reshape(-1), jnp.float32)
                       for j in range(n)],
            "alpha2": [jnp.asarray(arr(f"{name}.activations2.{j}.alpha"
                                       ).reshape(-1), jnp.float32)
                       for j in range(n)],
        }

    n_up = len(cfg.upsample_rates)
    n_k = len(cfg.resblock_kernel_sizes)
    return {
        "f0_convs": [wn_conv(f"f0_predictor.condnet.{2 * i}")
                     for i in range(5)],
        "f0_out_w": jnp.asarray(arr("f0_predictor.classifier.weight").T,
                                jnp.float32),
        "f0_out_b": jnp.asarray(arr("f0_predictor.classifier.bias"),
                                jnp.float32),
        "source_linear_w": jnp.asarray(arr("m_source.l_linear.weight").T,
                                       jnp.float32),
        "source_linear_b": jnp.asarray(arr("m_source.l_linear.bias"),
                                       jnp.float32),
        "conv_pre": wn_conv("conv_pre"),
        "ups": [wn_conv(f"ups.{i}") for i in range(n_up)],
        "source_downs": [conv(f"source_downs.{i}") for i in range(n_up)],
        "source_resblocks": [
            resblock(f"source_resblocks.{i}",
                     len(cfg.resblock_dilations[i])) for i in range(n_up)],
        "resblocks": [resblock(f"resblocks.{i * n_k + j}",
                               len(cfg.resblock_dilations[j]))
                      for i in range(n_up) for j in range(n_k)],
        "conv_post": wn_conv("conv_post"),
    }


# ---------------------------------------------------------------------------
# streaming (chunked) decode — reference HiFTGeneratorCache semantics
# ---------------------------------------------------------------------------

#: mel frames of context carried between chunks (reference cosyvoice2.py:858)
HIFT_CTX_FRAMES = 6


def init_hift_cache(cfg: HiFTConfig, batch: int,
                    ctx_frames: int = HIFT_CTX_FRAMES) -> dict:
    """Per-request streaming state (reference HiFTGeneratorCache,
    hifigan.py:26-31): `mel` context frames, `source` excitation tail for
    phase continuity, `speech` held-back output tail for crossfade."""
    up = cfg.total_upsample
    return {
        "mel": jnp.zeros((batch, cfg.in_channels, ctx_frames)),
        "source": jnp.zeros((batch, 1, ctx_frames * up)),
        "speech": jnp.zeros((batch, ctx_frames * up)),
        # False until the first chunk has decoded: the first chunk's head
        # samples come from the all-zero context mel (vocoder garbage) and
        # are muted instead of crossfaded in
        "primed": jnp.zeros((batch,), bool),
    }


def hift_decode_chunk(params: dict, cfg: HiFTConfig, mel: jax.Array,
                      cache: dict, rng: jax.Array | None = None
                      ) -> tuple[jax.Array, dict]:
    """One streaming chunk: mel (B, C, T) new frames -> (wav (B, T*up),
    new_cache).

    Reference semantics (cosyvoice2.py:1050-1075 + hifigan.py:640-665):
    prepend the cached context mel, overwrite the regenerated source head
    with the cached excitation (phase continuity), Hamming-crossfade the
    head samples against the previous chunk's held-back speech tail, then
    hold back this chunk's tail for the next call. Output is therefore
    delayed by ctx frames relative to offline decode — identical shift to
    the reference streaming path.
    """
    ctx = cache["mel"].shape[2]
    up = cfg.total_upsample
    n = ctx * up
    mel_in = jnp.concatenate([cache["mel"].astype(mel.dtype), mel], axis=2)
    wav, source = hift_decode(params, cfg, mel_in,
                              source_cache=cache["source"], rng=rng)
    window = jnp.asarray(np.hamming(2 * n).astype(np.float32))
    head = wav[:, :n] * window[None, :n] \
        + cache["speech"].astype(wav.dtype) * window[None, n:]
    # first chunk: the head decodes the all-zero context mel — mute it
    # (leading silence) instead of Hamming-ramping vocoder garbage in
    primed = cache.get("primed")
    if primed is not None:
        head = jnp.where(primed[:, None], head, jnp.zeros_like(head))
    wav = jnp.concatenate([head, wav[:, n:]], axis=1)
    new_cache = {
        "mel": mel_in[:, :, -ctx:],
        "source": source[:, :, -n:],
        "speech": wav[:, -n:],
    }
    if primed is not None:
        new_cache["primed"] = jnp.ones_like(primed)
    return wav[:, :-n], new_cache
