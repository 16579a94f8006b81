"""S3 speech tokenizer v2 (25 Hz), weight-exact.

Faithful JAX port of the reference ``S3TokenizerV2`` (tokenizer/s3.py:
245-623): whisper mel front-end, conv stem (x2 stride twice -> 25 Hz),
6 FSMN-attention transformer layers (depthwise k31 memory conv added to the
attention output, GPT-NeoX rotary with duplicated cos/sin, k-proj
bias-free), and the FSQ head (project to 8 dims, tanh * 0.999, round+1,
mixed-radix base-3 readout -> 6561 tokens).

The published weights ship as speech_tokenizer_v2.onnx; tensors are
extracted by onnx_reader.load_onnx_initializers, and for Chatterbox/
CosyVoice torch-format conversions map directly. Used for voice-clone
reference prompts (CosyVoice2 ICL, Chatterbox cond prompts) at preprocess
time.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class S3V2Config:
    n_mels: int = 128
    n_state: int = 1280
    heads: int = 20
    layers: int = 6
    stride: int = 2
    fsmn_kernel: int = 31
    fsq_dim: int = 8
    fsq_level: int = 3
    rope_dim: int = 64
    rope_max: int = 2048

    @property
    def vocab_size(self) -> int:
        return self.fsq_level ** self.fsq_dim


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------
def load_s3v2_params(sd: dict, cfg: S3V2Config,
                     prefix: str = "") -> dict:
    def arr(n):
        return jnp.asarray(np.asarray(sd[prefix + n]), jnp.float32)

    def lin(n, bias=True):
        p = {"w": arr(f"{n}.weight")}
        if bias and prefix + n + ".bias" in sd:
            p["b"] = arr(f"{n}.bias")
        return p

    def ln(n):
        return arr(f"{n}.weight"), arr(f"{n}.bias")

    layers = []
    for i in range(cfg.layers):
        pre = f"encoder.blocks.{i}"
        l1w, l1b = ln(f"{pre}.attn_ln")
        l2w, l2b = ln(f"{pre}.mlp_ln")
        layers.append({
            "q": lin(f"{pre}.attn.query"),
            "k": lin(f"{pre}.attn.key", bias=False),
            "v": lin(f"{pre}.attn.value"),
            "o": lin(f"{pre}.attn.out"),
            "fsmn_w": arr(f"{pre}.attn.fsmn_block.weight"),  # (C, 1, K)
            "ln1_w": l1w, "ln1_b": l1b,
            "fc1": lin(f"{pre}.mlp.0"), "fc2": lin(f"{pre}.mlp.2"),
            "ln2_w": l2w, "ln2_b": l2b,
        })
    return {
        "conv1": {"w": arr("encoder.conv1.weight"),
                  "b": arr("encoder.conv1.bias")},
        "conv2": {"w": arr("encoder.conv2.weight"),
                  "b": arr("encoder.conv2.bias")},
        "layers": layers,
        "fsq_proj": lin("quantizer._codebook.project_down"),
    }


def init_s3v2_params(key: jax.Array, cfg: S3V2Config) -> dict:
    ks = iter(jax.random.split(key, 128))

    def lin(cin, cout, bias=True):
        p = {"w": jax.random.normal(next(ks), (cout, cin)) / math.sqrt(cin)}
        if bias:
            p["b"] = jnp.zeros((cout,))
        return p

    C = cfg.n_state
    return {
        "conv1": {"w": jax.random.normal(next(ks), (C, cfg.n_mels, 3)) * 0.05,
                  "b": jnp.zeros((C,))},
        "conv2": {"w": jax.random.normal(next(ks), (C, C, 3)) * 0.02,
                  "b": jnp.zeros((C,))},
        "layers": [{
            "q": lin(C, C), "k": lin(C, C, bias=False), "v": lin(C, C),
            "o": lin(C, C),
            "fsmn_w": jax.random.normal(
                next(ks), (C, 1, cfg.fsmn_kernel)) * 0.02,
            "ln1_w": jnp.ones((C,)), "ln1_b": jnp.zeros((C,)),
            "fc1": lin(C, 4 * C), "fc2": lin(4 * C, C),
            "ln2_w": jnp.ones((C,)), "ln2_b": jnp.zeros((C,)),
        } for _ in range(cfg.layers)],
        "fsq_proj": lin(C, cfg.fsq_dim),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _lin(p, x):
    y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y


def _rope_tables(cfg: S3V2Config, T: int):
    dim = cfg.rope_dim
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2)[: dim // 2] / dim))
    t = np.arange(T)
    ang = np.outer(t, freqs).astype(np.float32)   # (T, dim/2)
    cos = np.concatenate([np.cos(ang), np.cos(ang)], axis=-1)
    sin = np.concatenate([np.sin(ang), np.sin(ang)], axis=-1)
    return jnp.asarray(cos), jnp.asarray(sin)     # (T, dim)


def _rotate_half(x):
    d = x.shape[-1]
    return jnp.concatenate([-x[..., d // 2:], x[..., :d // 2]], axis=-1)


def s3v2_encode(params: dict, cfg: S3V2Config, mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, T_mel) -> speech tokens (B, T_mel // 4) int32."""
    x = jax.lax.conv_general_dilated(
        mel, params["conv1"]["w"], (cfg.stride,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH")) \
        + params["conv1"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = jax.lax.conv_general_dilated(
        x, params["conv2"]["w"], (2,), ((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH")) \
        + params["conv2"]["b"][None, :, None]
    x = jax.nn.gelu(x, approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T, C)

    B, T, C = x.shape
    H = cfg.heads
    hd = C // H
    cos, sin = _rope_tables(cfg, T)
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    scale = hd ** -0.25

    for lp in params["layers"]:
        h = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps=1e-6)
        q = _lin(lp["q"], h).reshape(B, T, H, hd)
        k = _lin(lp["k"], h).reshape(B, T, H, hd)
        v = _lin(lp["v"], h).reshape(B, T, H, hd)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin

        # FSMN memory: depthwise conv over V (pre-rotary V), residual
        v_flat = v.reshape(B, T, C).transpose(0, 2, 1)  # (B, C, T)
        pad_l = (cfg.fsmn_kernel - 1) // 2
        pad_r = cfg.fsmn_kernel - 1 - pad_l
        mem = jax.lax.conv_general_dilated(
            jnp.pad(v_flat, ((0, 0), (0, 0), (pad_l, pad_r))),
            lp["fsmn_w"], (1,), ((0, 0),),
            feature_group_count=C,
            dimension_numbers=("NCH", "OIH", "NCH"))
        fsm_memory = (mem.transpose(0, 2, 1) + v.reshape(B, T, C))

        s = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
        a = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, -1), v)
        x = x + _lin(lp["o"], a.reshape(B, T, C)) + fsm_memory

        h2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        x = x + _lin(lp["fc2"], jax.nn.gelu(_lin(lp["fc1"], h2),
                                            approximate=False))

    # FSQ readout (tokenizer/s3.py:309-323)
    hq = jnp.tanh(_lin(params["fsq_proj"], x)) * 0.9990000128746033
    hq = jnp.round(hq) + 1.0
    powers = jnp.asarray(
        cfg.fsq_level ** np.arange(cfg.fsq_dim), jnp.float32)
    return jnp.sum(hq * powers, axis=-1).astype(jnp.int32)
