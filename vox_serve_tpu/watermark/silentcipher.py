"""SilentCipher watermark embedder (sony/silentcipher), weight-compatible.

Faithful JAX re-implementation of the reference encode path
(watermarker/silentcipher.py:19-600): gated-conv2d Encoder (1->32x3),
message linear, CarrierDecoder (96-dim gated convs -> residual magnitude),
hann 1024/512 STFT/ISTFT, VCTK power normalization and SDR scaling — the
exact message-embedding math, so the published ``sony/silentcipher``
checkpoints (enc_c.ckpt / dec_c.ckpt / dec_m_i.ckpt) map directly via
``load_silentcipher_params`` and the reference decoder can read our marks.
The MsgDecoder is ported too for round-trip detection tests.

The 44.1 kHz model watermarks 24 kHz serving audio through a polyphase
sinc resample (24k -> 44.1k -> 24k), mirroring the reference's torchaudio
resample round-trip (silentcipher.py:525-530).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbone import _init_linear, linear


@dataclasses.dataclass(frozen=True)
class SilentCipherConfig:
    n_fft: int = 1024
    hop: int = 512
    sr: int = 44100
    message_dim: int = 5        # one-hot symbols: terminator + 4 2-bit values
    message_len: int = 21       # 5 bytes -> 20 2-bit symbols + terminator
    message_band_size: int = 1024
    enc_layers: int = 3
    dec_layers: int = 4
    msg_dec_layers: int = 10
    msg_dec_dim: int = 128
    message_sdr: float = 36.0
    frame_level_normalization: bool = True
    average_energy_vctk: float = 0.002837200844477648

    @property
    def bins(self) -> int:
        return self.n_fft // 2 + 1


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def _init_conv2d(key, cin, cout, k):
    scale = 1.0 / math.sqrt(cin * k * k)
    k1, k2 = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (cout, cin, k, k), minval=-scale,
                                    maxval=scale),
            "b": jax.random.uniform(k2, (cout,), minval=-scale, maxval=scale)}


def _init_gated(key, cin, cout, k):
    k1, k2 = jax.random.split(key)
    return {
        "conv": _init_conv2d(k1, cin, cout, k),
        "gate": _init_conv2d(k2, cin, cout, k),
        "bn_w": jnp.ones((cout,)), "bn_b": jnp.zeros((cout,)),
        "bn_mean": jnp.zeros((cout,)), "bn_var": jnp.ones((cout,)),
    }


def init_silentcipher(cfg: SilentCipherConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 64))

    def nk():
        return next(keys)

    enc = [_init_gated(nk(), 1, 32, 3)]
    for _ in range(cfg.enc_layers - 2):
        enc.append(_init_gated(nk(), 32, 32, 3))
    enc.append(_init_gated(nk(), 32, 32, 3))

    dec = [_init_gated(nk(), 96, 96, 3)]
    for _ in range(cfg.dec_layers - 2):
        dec.append(_init_gated(nk(), 96, 96, 3))
    dec.append(_init_gated(nk(), 96, 1, 1))

    msg = [_init_gated(nk(), 1, cfg.msg_dec_dim, 3)]
    for _ in range(cfg.msg_dec_layers - 2):
        msg.append(_init_gated(nk(), cfg.msg_dec_dim, cfg.msg_dec_dim, 3))
    msg.append(_init_gated(nk(), cfg.msg_dec_dim, cfg.message_dim, 3))

    return {
        "enc_c": {"main": enc,
                  "linear": _init_linear(nk(), cfg.message_dim,
                                         cfg.message_band_size, jnp.float32,
                                         bias=True)},
        "dec_c": {"main": dec},
        "dec_m": {"main": msg,
                  "linear": _init_linear(nk(), cfg.message_band_size, 1,
                                         jnp.float32, bias=True)},
    }


def load_silentcipher_params(ckpt_dir, cfg: SilentCipherConfig) -> dict:
    """Map the published checkpoint directory (enc_c.ckpt / dec_c.ckpt /
    dec_m_0.ckpt torch state dicts, reference silentcipher.py:647-663)."""
    import os

    import torch

    def sd(path):
        raw = torch.load(os.path.join(ckpt_dir, path), map_location="cpu")
        return {k.replace("module.", ""): v.numpy() for k, v in raw.items()}

    def gated(d, i):
        return {
            "conv": {"w": jnp.asarray(d[f"main.{i}.conv.weight"]),
                     "b": jnp.asarray(d[f"main.{i}.conv.bias"])},
            "gate": {"w": jnp.asarray(d[f"main.{i}.gate.weight"]),
                     "b": jnp.asarray(d[f"main.{i}.gate.bias"])},
            "bn_w": jnp.asarray(d[f"main.{i}.bn.weight"]),
            "bn_b": jnp.asarray(d[f"main.{i}.bn.bias"]),
            "bn_mean": jnp.asarray(d[f"main.{i}.bn.running_mean"]),
            "bn_var": jnp.asarray(d[f"main.{i}.bn.running_var"]),
        }

    enc_d = sd("enc_c.ckpt")
    dec_d = sd("dec_c.ckpt")
    msg_d = sd("dec_m_0.ckpt")

    def count_layers(d):
        return max(int(k.split(".")[1]) for k in d if k.startswith("main.")) + 1

    def gated_stack(d, drop_every=1):
        idxs = sorted({int(k.split(".")[1]) for k in d
                       if k.startswith("main.") and ".conv." in k})
        return [gated(d, i) for i in idxs]

    return {
        "enc_c": {"main": gated_stack(enc_d),
                  "linear": {"w": jnp.asarray(enc_d["linear.weight"]).T,
                             "b": jnp.asarray(enc_d["linear.bias"])}},
        "dec_c": {"main": gated_stack(dec_d)},
        "dec_m": {"main": gated_stack(msg_d),
                  "linear": {"w": jnp.asarray(msg_d["linear.weight"]).T,
                             "b": jnp.asarray(msg_d["linear.bias"])}},
    }


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


def _conv2d(p, x, padding):
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["b"][None, :, None, None]


def _gated_layer(p, x):
    pad = (p["conv"]["w"].shape[-1] - 1) // 2
    h = _conv2d(p["conv"], x, pad) * jax.nn.sigmoid(_conv2d(p["gate"], x, pad))
    # BatchNorm2d inference
    mean = p["bn_mean"][None, :, None, None]
    var = p["bn_var"][None, :, None, None]
    h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
    return h * p["bn_w"][None, :, None, None] + p["bn_b"][None, :, None, None]


def _stack(ps, x):
    for p in ps:
        x = _gated_layer(p, x)
    return x


def sc_stft(cfg: SilentCipherConfig, x: jax.Array):
    """x (B, S) -> (mag, phase) each (B, bins, F). torch.stft(center=True)
    semantics with the reference's tail pad to a hop multiple and epsilon
    magnitude (silentcipher.py:126-140)."""
    n, hop = cfg.n_fft, cfg.hop
    pad_tail = n - x.shape[1] % n
    x = jnp.pad(x, ((0, 0), (0, pad_tail)))
    window = jnp.asarray(np.hanning(n + 1)[:-1].astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (n // 2, n // 2)), mode="reflect")
    F = (xp.shape[1] - n) // hop + 1
    idx = jnp.arange(F)[:, None] * hop + jnp.arange(n)[None, :]
    frames = xp[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    sq = jnp.square(spec.real) + jnp.square(spec.imag)
    eps = (sq == 0).astype(jnp.float32) * 1e-24
    mag = jnp.sqrt(sq + eps) - jnp.sqrt(eps)
    phase = jnp.arctan2(spec.imag, spec.real)
    return mag.transpose(0, 2, 1), phase.transpose(0, 2, 1)


def sc_istft(cfg: SilentCipherConfig, mag: jax.Array, phase: jax.Array,
             num_samples: int) -> jax.Array:
    n, hop = cfg.n_fft, cfg.hop
    window = jnp.asarray(np.hanning(n + 1)[:-1].astype(np.float32))
    comp = mag * jnp.cos(phase) + 1j * mag * jnp.sin(phase)
    frames = jnp.fft.irfft(comp.transpose(0, 2, 1), n=n, axis=-1)
    frames = frames * window[None, None, :]
    B, F, _ = frames.shape
    out_len = n + hop * (F - 1)
    idx = jnp.arange(F)[:, None] * hop + jnp.arange(n)[None, :]
    sig = jnp.zeros((B, out_len)).at[:, idx.reshape(-1)].add(
        frames.reshape(B, -1))
    denom = jnp.zeros((out_len,)).at[idx.reshape(-1)].add(
        jnp.tile(jnp.square(window), (F,)))
    sig = sig / jnp.where(denom > 1e-11, denom, 1.0)[None]
    sig = sig[:, n // 2:]
    # reference trims win_len - (num_samples % win_len) from the end
    padding = n - (num_samples % n)
    return sig[:, :out_len - n // 2 - padding]


def message_to_symbols(message: list[int], cfg: SilentCipherConfig
                       ) -> np.ndarray:
    """5-byte key -> 20 2-bit symbols + terminator, one-hot (message_dim,
    message_len) tiled to any frame count later (silentcipher.py:481-489,
    letters_encoding)."""
    bits = "".join(f"{m:08b}" for m in message)
    syms = [int(bits[i * 2:i * 2 + 2], 2) for i in range(len(bits) // 2)]
    index = np.concatenate([np.asarray(syms) + 1, [0]])
    return np.identity(cfg.message_dim)[index].T.astype(np.float32)


def sc_encode(params: dict, cfg: SilentCipherConfig, y: jax.Array,
              message_onehot: jax.Array,
              message_sdr: float | None = None) -> jax.Array:
    """y (B, S) at cfg.sr -> watermarked (B, S). Exact reference math
    (silentcipher.py:470-540, minus the zero-power early-out)."""
    sdr = cfg.message_sdr if message_sdr is None else message_sdr
    S = y.shape[1]
    power = jnp.mean(jnp.square(y), axis=1, keepdims=True)
    power = jnp.maximum(power, 1e-12)
    yn = y * jnp.sqrt(cfg.average_energy_vctk / power)

    mag, phase = sc_stft(cfg, yn)                       # (B, bins, F)
    carrier = mag[:, None]                              # (B, 1, bins, F)
    F = mag.shape[-1]

    # tile the one-hot message across frames
    reps = -(-F // cfg.message_len)
    msg = jnp.tile(message_onehot, (1, reps))[:, :F]    # (dim, F)
    msg = msg[None, None]                               # (1, 1, dim, F)
    msg = jnp.broadcast_to(msg, (mag.shape[0], 1) + msg.shape[2:])

    enc = params["enc_c"]
    carrier_enc = _stack(enc["main"], carrier)          # (B, 32, bins, F)
    # transform_message: linear over the symbol axis -> band rows, zero-pad
    # up to bins (silentcipher.py:50-53)
    m = linear(enc["linear"], msg.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)
    m = jnp.pad(m, ((0, 0), (0, 0), (0, cfg.bins - cfg.message_band_size),
                    (0, 0)))

    merged = jnp.concatenate(
        [carrier_enc, jnp.repeat(carrier, 32, 1), jnp.repeat(m, 32, 1)],
        axis=1)                                         # (B, 96, bins, F)
    info = _stack(params["dec_c"]["main"], merged)      # (B, 1, bins, F)
    info = info.at[:, :, cfg.message_band_size:, :].set(0.0)
    info = info / jnp.sqrt(jnp.mean(jnp.square(info), axis=2, keepdims=True)
                           + 1e-24) / (10.0 ** (sdr / 20.0))
    if cfg.frame_level_normalization:
        info = info * jnp.sqrt(jnp.mean(jnp.square(carrier), axis=2,
                                        keepdims=True))
    out_mag = jnp.abs(info + carrier)[:, 0]
    out = sc_istft(cfg, out_mag, phase, S)
    out = out * jnp.sqrt(power / cfg.average_energy_vctk)
    return out[:, :S]


def sc_decode_symbols(params: dict, cfg: SilentCipherConfig,
                      y: jax.Array) -> jax.Array:
    """y (B, S) -> per-frame symbol predictions (B, F) via the MsgDecoder
    (silentcipher.py:85-105)."""
    power = jnp.mean(jnp.square(y), axis=1, keepdims=True)
    yn = y * jnp.sqrt(cfg.average_energy_vctk / jnp.maximum(power, 1e-12))
    mag, _ = sc_stft(cfg, yn)
    x = mag[:, None, :cfg.message_band_size, :]
    h = _stack(params["dec_m"]["main"], x)              # (B, dim, band, F)
    h = linear(params["dec_m"]["linear"],
               h.transpose(0, 1, 3, 2))[..., 0]         # (B, dim, F)
    return jnp.argmax(h, axis=1)


# ---------------------------------------------------------------------------
# resample (24 kHz serving audio <-> 44.1 kHz model rate)
# ---------------------------------------------------------------------------


def _resample_filter(up: int, down: int, zeros: int = 12) -> np.ndarray:
    """Windowed-sinc lowpass for polyphase resampling by up/down, designed
    in the zero-stuffed (rate x up) domain: cutoff at the tighter of the two
    Nyquists, `zeros` sinc zero-crossings per side, Hann window, total DC
    gain `up` (compensates the 1/up amplitude loss of zero-stuffing; the
    torchaudio/julius convention the reference relies on through
    torchaudio.functional.resample)."""
    fc = 0.5 / max(up, down)  # cycles per upsampled sample
    taps = 2 * zeros * max(up, down) + 1
    t = np.arange(taps) - taps // 2
    h = 2 * fc * np.sinc(2 * fc * t)
    h *= np.hanning(taps)
    return (h * (up / h.sum())).astype(np.float32)


def sinc_resample(x: jax.Array, orig_sr: int, new_sr: int,
                  out_len: str = "floor") -> jax.Array:
    """Polyphase windowed-sinc resample along the last axis (any leading
    dims). ``out_len`` picks the output-length convention: "floor"
    (S*up//down, julius) or "ceil" (torchaudio.functional.resample)."""
    if orig_sr == new_sr:
        return x
    g = math.gcd(orig_sr, new_sr)
    up, down = new_sr // g, orig_sr // g
    lead, S = x.shape[:-1], x.shape[-1]
    flat = x.reshape((-1, S))
    h = jnp.asarray(_resample_filter(up, down)).astype(flat.dtype)
    taps = h.shape[0]
    xe = jnp.zeros((flat.shape[0], S * up), flat.dtype).at[:, ::up].set(flat)
    pad = taps // 2
    y = jax.lax.conv_general_dilated(
        xe[:, None, :], h[None, None, :], window_strides=(down,),
        padding=((pad, pad),), dimension_numbers=("NCH", "OIH", "NCH"))[:, 0]
    n_out = -(-S * up // down) if out_len == "ceil" else S * up // down
    return y[:, :n_out].reshape(lead + (n_out,))
