"""Zonos speaker-embedding network (ResNet293/SimAM + ASP + LDA) in JAX.

Weight-exact port of the reference's ``ZonosSpeakerEmbeddingLDA``
(encoder/zonos.py:357-411): log-mel fbank -> ResNet293 (SimAM basic blocks,
[10, 20, 64, 3]) -> attentive-statistics pooling -> 256-d bottleneck ->
LDA linear -> 128-d conditioning vector. Checkpoints are the two ``.pt``
files from Zyphra/Zonos-v0.1-speaker-embedding.

Speaker extraction is a per-request preprocess step (not in the decode hot
loop); the forward is jitted per mel length. Callers quantize the waveform
length (truncation to 0.5 s steps) to bound the executable count.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

MEL_SR = 16000
N_FFT = 512
WIN = 400  # 0.025 s
HOP = 160  # 0.010 s
N_MELS = 80


# ---------------------------------------------------------------------------
# log-mel front-end (torchaudio MelSpectrogram defaults: power 2, HTK mel
# scale, no norm, center/reflect padding, Hann window)
# ---------------------------------------------------------------------------
def _htk_mel_filterbank() -> np.ndarray:
    n_freqs = N_FFT // 2 + 1
    all_freqs = np.linspace(0, MEL_SR / 2, n_freqs)
    m_min = 2595.0 * math.log10(1.0 + 0.0 / 700.0)
    m_max = 2595.0 * math.log10(1.0 + (MEL_SR / 2) / 700.0)
    m_pts = np.linspace(m_min, m_max, N_MELS + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (freq, mel+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)  # (n_freqs, n_mels)


_MEL_FB = _htk_mel_filterbank()


def log_fbank(wav: np.ndarray) -> np.ndarray:
    """(T,) float32 @ 16 kHz -> (1, 80, frames) log-mel, mean-subtracted per
    mel bin (reference logFbankCal, encoder/zonos.py:14-36)."""
    x = np.asarray(wav, np.float32)
    pad = N_FFT // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP
    window = np.hanning(WIN + 1)[:-1].astype(np.float32)
    frames = np.lib.stride_tricks.sliding_window_view(x, N_FFT)[::HOP][:n_frames]
    # torchaudio pads the window to n_fft (win centered)
    wpad = np.zeros(N_FFT, np.float32)
    off = (N_FFT - WIN) // 2
    wpad[off:off + WIN] = window
    spec = np.abs(np.fft.rfft(frames * wpad, axis=-1)) ** 2  # (frames, freq)
    mel = spec @ _MEL_FB  # (frames, n_mels)
    out = np.log(mel.T + 1e-6)  # (n_mels, frames)
    out = out - out.mean(axis=1, keepdims=True)
    return out[None]


def resample_to_16k(wav: np.ndarray, sr: int) -> np.ndarray:
    if sr == MEL_SR:
        return np.asarray(wav, np.float32)
    n_out = int(round(len(wav) * MEL_SR / sr))
    pos = np.linspace(0.0, len(wav) - 1, n_out)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, len(wav) - 1)
    frac = (pos - i0).astype(np.float32)
    w = np.asarray(wav, np.float32)
    return w[i0] * (1 - frac) + w[i1] * frac


# ---------------------------------------------------------------------------
# weight mapping
# ---------------------------------------------------------------------------
NUM_BLOCKS = (10, 20, 64, 3)
IN_PLANES = 64


def load_zonos_speaker_params(sd: dict, lda_sd: dict | None = None) -> dict:
    """Map the ResNet293_SimAM_ASP_base.pt state dict (+ optional LDA-128)
    onto a JAX pytree."""
    def arr(n):
        return jnp.asarray(np.asarray(sd[n]), jnp.float32)

    def conv(n):
        p = {"w": arr(f"{n}.weight")}
        if f"{n}.bias" in sd:
            p["b"] = arr(f"{n}.bias")
        return p

    def bn(n):
        return {"scale": arr(f"{n}.weight"), "bias": arr(f"{n}.bias"),
                "mean": arr(f"{n}.running_mean"), "var": arr(f"{n}.running_var")}

    def block(pre):
        b = {"conv1": conv(f"{pre}.conv1"), "bn1": bn(f"{pre}.bn1"),
             "conv2": conv(f"{pre}.conv2"), "bn2": bn(f"{pre}.bn2")}
        if f"{pre}.downsample.0.weight" in sd:
            b["down_conv"] = conv(f"{pre}.downsample.0")
            b["down_bn"] = bn(f"{pre}.downsample.1")
        return b

    front = {"conv1": conv("front.conv1"), "bn1": bn("front.bn1")}
    for li, n in enumerate(NUM_BLOCKS, start=1):
        front[f"layer{li}"] = [block(f"front.layer{li}.{i}")
                               for i in range(n)]
    params = {
        "front": front,
        "asp": {
            "att_conv1": conv("pooling.attention.0"),
            "att_bn": bn("pooling.attention.2"),
            "att_conv2": conv("pooling.attention.3"),
        },
        "bottleneck": {"w": arr("bottleneck.weight"),
                       "b": arr("bottleneck.bias")},
    }
    if lda_sd is not None:
        params["lda"] = {
            "w": jnp.asarray(np.asarray(lda_sd["weight"]), jnp.float32),
            "b": jnp.asarray(np.asarray(lda_sd["bias"]), jnp.float32)}
    return params


def init_zonos_speaker_params(key: jax.Array, scale_blocks: tuple = NUM_BLOCKS,
                              in_planes: int = IN_PLANES,
                              acoustic_dim: int = N_MELS) -> dict:
    """Random init in the reference's exact shapes (test/debug use)."""
    keys = iter(jax.random.split(key, 4096))

    def nk():
        return next(keys)

    def conv(cin, cout, k, bias=False):
        fan = cin * k * k
        p = {"w": jax.random.normal(nk(), (cout, cin, k, k)) / math.sqrt(fan)}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    def conv1d_(cin, cout):
        p = {"w": jax.random.normal(nk(), (cout, cin, 1)) * 0.05,
             "b": jnp.zeros((cout,))}
        return p

    def bn(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    front = {"conv1": conv(1, in_planes, 3), "bn1": bn(in_planes)}
    cur = in_planes
    for li, n in enumerate(scale_blocks, start=1):
        planes = in_planes * (2 ** (li - 1))
        stride0 = 1 if li == 1 else 2
        blocks = []
        for i in range(n):
            b = {"conv1": conv(cur, planes, 3), "bn1": bn(planes),
                 "conv2": conv(planes, planes, 3), "bn2": bn(planes)}
            if (stride0 if i == 0 else 1) != 1 or cur != planes:
                b["down_conv"] = conv(cur, planes, 1)
                b["down_bn"] = bn(planes)
            blocks.append(b)
            cur = planes
        front[f"layer{li}"] = blocks
    feat = in_planes * 8 * (acoustic_dim // 8)
    params = {
        "front": front,
        "asp": {"att_conv1": conv1d_(feat, 128), "att_bn": bn(128),
                "att_conv2": conv1d_(128, feat)},
        "bottleneck": {"w": jax.random.normal(nk(), (256, feat * 2)) * 0.01,
                       "b": jnp.zeros((256,))},
        "lda": {"w": jax.random.normal(nk(), (128, 256)) * 0.1,
                "b": jnp.zeros((128,))},
    }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _conv2d(p, x, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        y = y + p["b"][None, :, None, None]
    return y


def _conv2d_k(p, x, stride):
    k = p["w"].shape[-1]
    return _conv2d(p, x, stride=stride, padding=(k - 1) // 2)


def _bn(p, x):
    shape = (1, -1) + (1,) * (x.ndim - 2)
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"].reshape(shape)) * (inv * p["scale"]).reshape(shape) \
        + p["bias"].reshape(shape)


def _simam(x, lambda_p=1e-4):
    n = x.shape[2] * x.shape[3] - 1
    d = jnp.square(x - x.mean(axis=(2, 3), keepdims=True))
    v = d.sum(axis=(2, 3), keepdims=True) / n
    e_inv = d / (4 * (v + lambda_p)) + 0.5
    return x * jax.nn.sigmoid(e_inv)


def _simam_block(p, x, stride):
    out = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"], x, stride=stride)))
    out = _bn(p["bn2"], _conv2d(p["conv2"], out))
    out = _simam(out)
    if "down_conv" in p:
        x = _bn(p["down_bn"], _conv2d_k(p["down_conv"], x, stride))
    return jax.nn.relu(out + x)


@functools.partial(jax.jit, static_argnames=())
def zonos_speaker_forward(params: dict, mel: jax.Array) -> tuple[jax.Array,
                                                                 jax.Array]:
    """mel: (1, 80, T) log-fbank. Returns (embedding[256], lda[128])."""
    f = params["front"]
    x = mel[:, None]  # (1, 1, 80, T)
    x = jax.nn.relu(_bn(f["bn1"], _conv2d(f["conv1"], x)))
    for li in range(1, 5):
        stride0 = 1 if li == 1 else 2
        for i, b in enumerate(f[f"layer{li}"]):
            x = _simam_block(b, x, stride0 if i == 0 else 1)

    # ASP: (B, C, H, W) -> (B, C*H, W) (reference encoder/zonos.py:54-61)
    B, C, H, W = x.shape
    x = x.reshape(B, C * H, W)
    a = params["asp"]

    def conv1(p, y):
        # pointwise Conv1d: weight (out, in, 1)
        return jnp.einsum("oi,bit->bot", p["w"][:, :, 0], y) \
            + p["b"][None, :, None]

    w = jax.nn.relu(conv1(a["att_conv1"], x))
    w = _bn(a["att_bn"], w)
    w = jax.nn.softmax(conv1(a["att_conv2"], w), axis=2)
    mu = jnp.sum(x * w, axis=2)
    sg = jnp.sqrt(jnp.clip(jnp.sum(jnp.square(x) * w, axis=2)
                           - jnp.square(mu), min=1e-5))
    pooled = jnp.concatenate([mu, sg], axis=1).reshape(B, -1)

    emb = pooled @ params["bottleneck"]["w"].T + params["bottleneck"]["b"]
    if "lda" in params:
        lda = emb @ params["lda"]["w"].T + params["lda"]["b"]
    else:
        lda = emb
    return emb[0], lda[0]


def extract_speaker_embedding(params: dict, wav: np.ndarray,
                              sr: int) -> np.ndarray:
    """Full reference pipeline: resample -> log-fbank -> network -> LDA.
    Waveform is truncated to 0.5 s granularity to bound jit executables."""
    wav16 = resample_to_16k(np.asarray(wav, np.float32), sr)
    step = MEL_SR // 2
    n = max(step, (len(wav16) // step) * step)
    mel = log_fbank(wav16[:n])
    _, lda = zonos_speaker_forward(params, jnp.asarray(mel))
    return np.asarray(lda, np.float32)
