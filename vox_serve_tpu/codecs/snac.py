"""SNAC multi-scale neural audio codec — decode path in JAX.

Re-implementation of the reference's SNAC decoder (tokenizer/snac.py:119-486):
multi-rate residual VQ (`from_codes`: per-codebook embedding -> 1x1 out_proj
-> repeat_interleave by stride, summed) followed by a conv decoder
(depthwise+pointwise stem, optional windowed local MHA, DecoderBlocks of
[Snake, ConvTranspose(2s, s), optional NoiseBlock, 3 dilated ResidualUnits],
Snake, 7-tap head, tanh). Weight-norm is folded at load time so all convs are
plain. Decode is stateless, so batched chunk windows jit directly.

Default config = hubertsiuzdak/snac_24khz (used by Orpheus).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .layers import (
    conv1d, conv_transpose1d, init_conv1d, init_conv_transpose1d, snake,
)


@dataclasses.dataclass(frozen=True)
class SNACConfig:
    sampling_rate: int = 24000
    decoder_dim: int = 1024
    decoder_rates: tuple[int, ...] = (8, 8, 4, 2)
    latent_dim: int = 768  # encoder_dim 48 * 2**4
    codebook_size: int = 4096
    codebook_dim: int = 8
    vq_strides: tuple[int, ...] = (4, 2, 1)
    noise: bool = True
    depthwise: bool = True
    attn_window_size: int | None = None  # None for snac_24khz

    @property
    def n_codebooks(self) -> int:
        return len(self.vq_strides)

    @property
    def hop_per_latent(self) -> int:
        return int(math.prod(self.decoder_rates))


def init_snac_decoder(cfg: SNACConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 256))

    def nk():
        return next(keys)

    params: dict = {"quantizers": []}
    for stride in cfg.vq_strides:
        params["quantizers"].append({
            "codebook": jax.random.normal(nk(), (cfg.codebook_size, cfg.codebook_dim)) * 0.02,
            "out_proj": init_conv1d(nk(), cfg.codebook_dim, cfg.latent_dim, 1),
        })

    ch = cfg.decoder_dim
    dec: dict = {}
    if cfg.depthwise:
        dec["stem_dw"] = init_conv1d(nk(), cfg.latent_dim, cfg.latent_dim, 7,
                                     groups=cfg.latent_dim)
        dec["stem_pw"] = init_conv1d(nk(), cfg.latent_dim, ch, 1)
    else:
        dec["stem"] = init_conv1d(nk(), cfg.latent_dim, ch, 7)

    blocks = []
    for i, stride in enumerate(cfg.decoder_rates):
        in_dim = ch // (2 ** i)
        out_dim = ch // (2 ** (i + 1))
        groups = out_dim if cfg.depthwise else 1
        b = {
            "alpha_in": jnp.ones((1, in_dim, 1)),
            "up": init_conv_transpose1d(nk(), in_dim, out_dim, 2 * stride),
            "res": [],
        }
        if cfg.noise:
            b["noise"] = init_conv1d(nk(), out_dim, out_dim, 1, bias=False)
        for dilation in (1, 3, 9):
            b["res"].append({
                "alpha1": jnp.ones((1, out_dim, 1)),
                "conv1": init_conv1d(nk(), out_dim, out_dim, 7, groups=groups),
                "alpha2": jnp.ones((1, out_dim, 1)),
                "conv2": init_conv1d(nk(), out_dim, out_dim, 1),
            })
        blocks.append(b)
    dec["blocks"] = blocks
    out_dim = ch // (2 ** len(cfg.decoder_rates))
    dec["alpha_out"] = jnp.ones((1, out_dim, 1))
    dec["head"] = init_conv1d(nk(), out_dim, 1, 7)
    params["decoder"] = dec
    return params


def load_snac_params(sd: dict, cfg: SNACConfig, prefix: str = "") -> dict:
    """Map the published SNAC checkpoint (hubertsiuzdak/snac_24khz layout,
    reference tokenizer/snac.py:360-486) onto the JAX pytree, folding
    weight-norm. Only the decode path (quantizer out_proj + decoder)."""
    import numpy as np

    from .layers import fold_weight_norm

    def arr(name):
        return np.asarray(sd[prefix + name])

    def wn(name):
        if prefix + name + ".parametrizations.weight.original0" in sd:
            w = fold_weight_norm(
                arr(f"{name}.parametrizations.weight.original0"),
                arr(f"{name}.parametrizations.weight.original1"))
        elif prefix + name + ".weight_g" in sd:
            w = fold_weight_norm(arr(f"{name}.weight_g"),
                                 arr(f"{name}.weight_v"))
        else:
            w = arr(f"{name}.weight")
        p = {"w": jnp.asarray(w, jnp.float32)}
        if prefix + name + ".bias" in sd:
            p["b"] = jnp.asarray(arr(f"{name}.bias"), jnp.float32)
        return p

    def alpha(name):
        return jnp.asarray(arr(name), jnp.float32)

    params: dict = {"quantizers": []}
    for i in range(len(cfg.vq_strides)):
        params["quantizers"].append({
            "codebook": jnp.asarray(
                arr(f"quantizer.quantizers.{i}.codebook.weight"), jnp.float32),
            "out_proj": wn(f"quantizer.quantizers.{i}.out_proj"),
        })

    dec: dict = {}
    d = "decoder.model"
    if cfg.depthwise:
        dec["stem_dw"] = wn(f"{d}.0")
        dec["stem_pw"] = wn(f"{d}.1")
        base = 2
    else:
        dec["stem"] = wn(f"{d}.0")
        base = 1
    if cfg.attn_window_size:
        base += 1  # LocalMHA occupies one slot
    blocks = []
    for i in range(len(cfg.decoder_rates)):
        pre = f"{d}.{base + i}.block"
        b = {
            "alpha_in": alpha(f"{pre}.0.alpha"),
            "up": wn(f"{pre}.1"),
            "res": [],
        }
        res_start = 2
        if cfg.noise:
            b["noise"] = wn(f"{pre}.2.linear")
            res_start = 3
        for j in range(3):
            rp = f"{pre}.{res_start + j}.block"
            b["res"].append({
                "alpha1": alpha(f"{rp}.0.alpha"),
                "conv1": wn(f"{rp}.1"),
                "alpha2": alpha(f"{rp}.2.alpha"),
                "conv2": wn(f"{rp}.3"),
            })
        blocks.append(b)
    dec["blocks"] = blocks
    n = base + len(cfg.decoder_rates)
    dec["alpha_out"] = alpha(f"{d}.{n}.alpha")
    dec["head"] = wn(f"{d}.{n + 1}")
    params["decoder"] = dec
    return params


def load_dac_params(sd: dict, cfg: SNACConfig) -> dict:
    """Map an HF ``DacModel`` state dict (descript/dac_44khz — what the
    reference loads at tokenizer/dac.py:10-14) onto the same decode pytree.

    DAC is the architecture SNAC derives from, so the machinery is shared;
    the differences are naming, no weight-norm (HF stores plain convs), no
    depthwise/noise/attn, and per-quantizer out_proj at every unit stride.
    Only the decode path (quantizer out_proj + decoder) is mapped.
    """
    import numpy as np

    def arr(name):
        return np.asarray(sd[name])

    def conv(name):
        p = {"w": jnp.asarray(arr(f"{name}.weight"), jnp.float32)}
        if name + ".bias" in sd:
            p["b"] = jnp.asarray(arr(f"{name}.bias"), jnp.float32)
        return p

    def alpha(name):
        return jnp.asarray(arr(name), jnp.float32)

    params: dict = {"quantizers": []}
    for i in range(len(cfg.vq_strides)):
        params["quantizers"].append({
            "codebook": jnp.asarray(
                arr(f"quantizer.quantizers.{i}.codebook.weight"), jnp.float32),
            "out_proj": conv(f"quantizer.quantizers.{i}.out_proj"),
        })

    dec: dict = {"stem": conv("decoder.conv1"), "blocks": []}
    for i in range(len(cfg.decoder_rates)):
        pre = f"decoder.block.{i}"
        b = {
            "alpha_in": alpha(f"{pre}.snake1.alpha"),
            "up": conv(f"{pre}.conv_t1"),
            "res": [],
        }
        for j in (1, 2, 3):
            rp = f"{pre}.res_unit{j}"
            b["res"].append({
                "alpha1": alpha(f"{rp}.snake1.alpha"),
                "conv1": conv(f"{rp}.conv1"),
                "alpha2": alpha(f"{rp}.snake2.alpha"),
                "conv2": conv(f"{rp}.conv2"),
            })
        dec["blocks"].append(b)
    dec["alpha_out"] = alpha("decoder.snake1.alpha")
    dec["head"] = conv("decoder.conv2")
    params["decoder"] = dec
    return params


def _residual_unit(p: dict, x: jax.Array, dilation: int, groups: int) -> jax.Array:
    pad = (7 - 1) * dilation // 2
    y = snake(x, p["alpha1"])
    y = conv1d(p["conv1"], y, padding=pad, dilation=dilation, groups=groups)
    y = snake(y, p["alpha2"])
    y = conv1d(p["conv2"], y)
    return x + y


def snac_from_codes(params: dict, cfg: SNACConfig,
                    codes: list[jax.Array]) -> jax.Array:
    """codes[i]: (B, T_i) int32 with T_i * stride_i == latent T. Returns
    z_q (B, latent_dim, T)."""
    z_q = None
    for i, stride in enumerate(cfg.vq_strides):
        q = params["quantizers"][i]
        emb = jnp.take(q["codebook"], codes[i], axis=0)  # (B, T_i, D)
        emb = emb.transpose(0, 2, 1)  # (B, D, T_i)
        z = conv1d(q["out_proj"], emb)
        if stride > 1:
            z = jnp.repeat(z, stride, axis=-1)
        z_q = z if z_q is None else z_q + z
    return z_q


def snac_decode(params: dict, cfg: SNACConfig, codes: list[jax.Array],
                noise_rng: jax.Array | None = None) -> jax.Array:
    """codes -> waveform (B, 1, T_latent * prod(decoder_rates)) in [-1, 1].

    NoiseBlock adds noise * linear(x); at inference the reference samples
    randn — we default to zeros (deterministic serving) unless a rng is given.
    """
    z = snac_from_codes(params, cfg, codes)
    dec = params["decoder"]
    if cfg.depthwise:
        x = conv1d(dec["stem_dw"], z, padding=3, groups=cfg.latent_dim)
        x = conv1d(dec["stem_pw"], x)
    else:
        x = conv1d(dec["stem"], z, padding=3)

    for b, stride in zip(dec["blocks"], cfg.decoder_rates):
        in_dim = b["alpha_in"].shape[1]
        out_dim = b["up"]["w"].shape[1]
        groups = out_dim if cfg.depthwise else 1
        x = snake(x, b["alpha_in"])
        x = conv_transpose1d(b["up"], x, stride=stride,
                             padding=math.ceil(stride / 2),
                             output_padding=stride % 2)
        if "noise" in b:
            h = conv1d(b["noise"], x)
            if noise_rng is not None:
                n = jax.random.normal(noise_rng, (x.shape[0], 1, x.shape[2]),
                                      dtype=x.dtype)
                x = x + n * h
        for j, dilation in enumerate((1, 3, 9)):
            x = _residual_unit(b["res"][j], x, dilation, groups)

    x = snake(x, dec["alpha_out"])
    x = conv1d(dec["head"], x, padding=3)
    return jnp.tanh(x)
