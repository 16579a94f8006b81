"""GLM-4-Voice flow-matching token->mel decoder, weight-exact.

Faithful JAX re-implementation of the reference GLMFlowModel
(tokenizer/glm.py:2032-2113): token embedding -> BlockConformerEncoder
(6 rel-pos conformer blocks whose attention mask is causal-OR-same-block,
block size 10, glm.py:434-600,1005-1113) -> encoder_proj ->
InterpolateRegulator (nearest resize to the 22.05 kHz mel rate + conv/
GroupNorm/Mish stack, glm.py:1114-1150) -> non-causal U-Net CFM estimator
(channels (256,256) with strided down/up sampling, glm.py:1694-1898) with a
10-step cosine Euler CFG solver (glm.py:1898-2032).

Conformer attention/pos-enc/FFN machinery is shared with
codecs/cosyvoice_flow.py (identical espnet modules). ``load_glm_flow_params``
walks the published flow.pt (zai-org/glm-4-voice-decoder) mechanically;
golden parity vs the reference torch module in tests/test_glm_flow_parity.py.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbone import _init_linear, linear
from ..ops.norms import layer_norm
from .cosyvoice_flow import (_conformer_layer, _lin, _mish, _rel_pos_emb)
from .layers import conv1d, conv_transpose1d, init_conv1d, init_conv_transpose1d


@dataclasses.dataclass(frozen=True)
class GLMFlowConfig:
    input_size: int = 512
    output_size: int = 512
    heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    block_size: int = 10
    vocab_size: int = 16384
    spk_dim: int = 192
    mel_dim: int = 80
    input_frame_rate: float = 12.5
    mel_sample_rate: int = 22050
    mel_hop: int = 256
    regulator_layers: int = 4
    # estimator (glm.py ConditionalDecoder defaults)
    est_channels: tuple[int, ...] = (256, 256)
    est_head_dim: int = 64
    est_heads: int = 8
    est_n_blocks: int = 4
    est_mid_blocks: int = 12
    n_timesteps: int = 10
    cfg_rate: float = 0.7

    def feat_len(self, token_len: int) -> int:
        return int(token_len / self.input_frame_rate
                   * self.mel_sample_rate / self.mel_hop)

    @property
    def est_in(self) -> int:  # x + mu + spks + cond
        return self.mel_dim * 4

    @property
    def time_embed_dim(self) -> int:
        return self.est_channels[0] * 4


# ---------------------------------------------------------------------------
# init / load (pytree mirrors torch names)
# ---------------------------------------------------------------------------


def init_glm_flow(cfg: GLMFlowConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 4096))

    def nk():
        return next(keys)

    d = cfg.output_size

    def conformer_layer():
        return {
            "self_attn": {
                "linear_q": _lin(nk(), d, d),
                "linear_k": _lin(nk(), d, d),
                "linear_v": _lin(nk(), d, d),
                "linear_out": _lin(nk(), d, d),
                "linear_pos": _lin(nk(), d, d, bias=False),
                "pos_bias_u": jax.random.normal(
                    nk(), (cfg.heads, d // cfg.heads)) * 0.02,
                "pos_bias_v": jax.random.normal(
                    nk(), (cfg.heads, d // cfg.heads)) * 0.02,
            },
            "feed_forward": {
                "w_1": _lin(nk(), d, cfg.linear_units),
                "w_2": _lin(nk(), cfg.linear_units, d),
            },
            "norm_mha": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "norm_ff": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        }

    def ln(dim):
        return {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}

    def gn_block(din, dout):
        return {"conv": init_conv1d(nk(), din, dout, 3),
                "gn_w": jnp.ones((dout,)), "gn_b": jnp.zeros((dout,))}

    def resnet(din, dout):
        return {
            "mlp": _lin(nk(), cfg.time_embed_dim, dout),
            "block1": gn_block(din, dout),
            "block2": gn_block(dout, dout),
            "res_conv": init_conv1d(nk(), din, dout, 1),
        }

    def tblock(dim):
        inner = cfg.est_heads * cfg.est_head_dim
        return {
            "norm1": ln(dim),
            "attn1": {
                "to_q": _lin(nk(), dim, inner, bias=False),
                "to_k": _lin(nk(), dim, inner, bias=False),
                "to_v": _lin(nk(), dim, inner, bias=False),
                "to_out": _lin(nk(), inner, dim),
            },
            "norm3": ln(dim),
            "ff": {"proj": _lin(nk(), dim, 4 * dim),
                   "out": _lin(nk(), 4 * dim, dim)},
        }

    chs = cfg.est_channels
    down, inch = [], cfg.est_in
    for i, ch in enumerate(chs):
        is_last = i == len(chs) - 1
        down.append({
            "resnet": resnet(inch, ch),
            "blocks": [tblock(ch) for _ in range(cfg.est_n_blocks)],
            "downsample": init_conv1d(nk(), ch, ch, 3),
        })
        inch = ch
    up_chs = tuple(reversed(chs)) + (chs[0],)
    up = []
    for i in range(len(up_chs) - 1):
        is_last = i == len(up_chs) - 2
        up.append({
            "resnet": resnet(up_chs[i] * 2, up_chs[i + 1]),
            "blocks": [tblock(up_chs[i + 1]) for _ in range(cfg.est_n_blocks)],
            "upsample": (init_conv1d(nk(), up_chs[i + 1], up_chs[i + 1], 3)
                         if is_last else
                         init_conv_transpose1d(nk(), up_chs[i + 1],
                                               up_chs[i + 1], 4)),
        })
    est = {
        "time_mlp": {
            "linear_1": _lin(nk(), cfg.est_in, cfg.time_embed_dim),
            "linear_2": _lin(nk(), cfg.time_embed_dim, cfg.time_embed_dim),
        },
        "down": down,
        "mid": [{"resnet": resnet(chs[-1], chs[-1]),
                 "blocks": [tblock(chs[-1])
                            for _ in range(cfg.est_n_blocks)]}
                for _ in range(cfg.est_mid_blocks)],
        "up": up,
        "final_block": gn_block(chs[0], chs[0]),
        "final_proj": init_conv1d(nk(), chs[0], cfg.mel_dim, 1),
    }

    reg = {"convs": [gn_block(cfg.mel_dim, cfg.mel_dim)
                     for _ in range(cfg.regulator_layers)],
           "out": init_conv1d(nk(), cfg.mel_dim, cfg.mel_dim, 1)}

    return {
        "input_embedding": (jax.random.normal(
            nk(), (cfg.vocab_size, cfg.input_size)) * 0.02),
        "spk_embed_affine_layer": _lin(nk(), cfg.spk_dim, cfg.mel_dim),
        "encoder": {
            "embed_out": _lin(nk(), cfg.input_size, d),
            "embed_norm": ln(d),
            "encoders": [conformer_layer() for _ in range(cfg.num_blocks)],
            "after_norm": ln(d),
        },
        "encoder_proj": _lin(nk(), d, cfg.mel_dim),
        "length_regulator": reg,
        "estimator": est,
    }


def load_glm_flow_params(sd: dict, cfg: GLMFlowConfig,
                         prefix: str = "") -> dict:
    """Map the zai-org/glm-4-voice-decoder flow.pt (GLMFlowModel.state_dict)
    onto the JAX pytree."""
    def arr(name):
        return jnp.asarray(np.asarray(sd[prefix + name]), jnp.float32)

    def lin(name, bias=True):
        p = {"w": arr(f"{name}.weight").T}
        if bias and prefix + name + ".bias" in sd:
            p["b"] = arr(f"{name}.bias")
        return p

    def conv(name):
        p = {"w": arr(f"{name}.weight")}
        if prefix + name + ".bias" in sd:
            p["b"] = arr(f"{name}.bias")
        return p

    def ln(name):
        return {"w": arr(f"{name}.weight"), "b": arr(f"{name}.bias")}

    def conformer_layer(pre):
        return {
            "self_attn": {
                "linear_q": lin(f"{pre}.self_attn.linear_q"),
                "linear_k": lin(f"{pre}.self_attn.linear_k"),
                "linear_v": lin(f"{pre}.self_attn.linear_v"),
                "linear_out": lin(f"{pre}.self_attn.linear_out"),
                "linear_pos": lin(f"{pre}.self_attn.linear_pos", bias=False),
                "pos_bias_u": arr(f"{pre}.self_attn.pos_bias_u"),
                "pos_bias_v": arr(f"{pre}.self_attn.pos_bias_v"),
            },
            "feed_forward": {
                "w_1": lin(f"{pre}.feed_forward.w_1"),
                "w_2": lin(f"{pre}.feed_forward.w_2"),
            },
            "norm_mha": ln(f"{pre}.norm_mha"),
            "norm_ff": ln(f"{pre}.norm_ff"),
        }

    def gn_block(pre):
        return {"conv": conv(f"{pre}.block.0"),
                "gn_w": arr(f"{pre}.block.1.weight"),
                "gn_b": arr(f"{pre}.block.1.bias")}

    def resnet(pre):
        return {
            "mlp": lin(f"{pre}.mlp.1"),
            "block1": gn_block(f"{pre}.block1"),
            "block2": gn_block(f"{pre}.block2"),
            "res_conv": conv(f"{pre}.res_conv"),
        }

    def tblock(pre):
        return {
            "norm1": ln(f"{pre}.norm1"),
            "attn1": {
                "to_q": lin(f"{pre}.attn1.to_q", bias=False),
                "to_k": lin(f"{pre}.attn1.to_k", bias=False),
                "to_v": lin(f"{pre}.attn1.to_v", bias=False),
                "to_out": lin(f"{pre}.attn1.to_out.0"),
            },
            "norm3": ln(f"{pre}.norm3"),
            "ff": {"proj": lin(f"{pre}.ff.net.0.proj"),
                   "out": lin(f"{pre}.ff.net.2")},
        }

    e = "decoder.estimator"
    chs = cfg.est_channels
    down = []
    for i in range(len(chs)):
        down.append({
            "resnet": resnet(f"{e}.down_blocks.{i}.0"),
            "blocks": [tblock(f"{e}.down_blocks.{i}.1.{j}")
                       for j in range(cfg.est_n_blocks)],
            "downsample": conv(
                f"{e}.down_blocks.{i}.2"
                + (".conv" if i != len(chs) - 1 else "")),
        })
    up = []
    for i in range(len(chs)):
        is_last = i == len(chs) - 1
        up.append({
            "resnet": resnet(f"{e}.up_blocks.{i}.0"),
            "blocks": [tblock(f"{e}.up_blocks.{i}.1.{j}")
                       for j in range(cfg.est_n_blocks)],
            "upsample": conv(f"{e}.up_blocks.{i}.2"
                             + ("" if is_last else ".conv")),
        })
    est = {
        "time_mlp": {"linear_1": lin(f"{e}.time_mlp.linear_1"),
                     "linear_2": lin(f"{e}.time_mlp.linear_2")},
        "down": down,
        "mid": [{"resnet": resnet(f"{e}.mid_blocks.{i}.0"),
                 "blocks": [tblock(f"{e}.mid_blocks.{i}.1.{j}")
                            for j in range(cfg.est_n_blocks)]}
                for i in range(cfg.est_mid_blocks)],
        "up": up,
        "final_block": gn_block(f"{e}.final_block"),
        "final_proj": conv(f"{e}.final_proj"),
    }

    reg = {"convs": [], "out": None}
    for i in range(cfg.regulator_layers):
        reg["convs"].append({
            "conv": conv(f"length_regulator.model.{3 * i}"),
            "gn_w": arr(f"length_regulator.model.{3 * i + 1}.weight"),
            "gn_b": arr(f"length_regulator.model.{3 * i + 1}.bias"),
        })
    reg["out"] = conv(f"length_regulator.model.{3 * cfg.regulator_layers}")

    return {
        "input_embedding": arr("input_embedding.weight"),
        "spk_embed_affine_layer": lin("spk_embed_affine_layer"),
        "encoder": {
            "embed_out": lin("encoder.embed.out.0"),
            "embed_norm": ln("encoder.embed.out.1"),
            "encoders": [conformer_layer(f"encoder.encoders.{i}")
                         for i in range(cfg.num_blocks)],
            "after_norm": ln("encoder.after_norm"),
        },
        "encoder_proj": lin("encoder_proj"),
        "length_regulator": reg,
        "estimator": est,
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _group_norm8(x, w, b, groups=8, eps=1e-5):
    """torch GroupNorm over (B, C, T)."""
    B, C, T = x.shape
    g = x.reshape(B, groups, C // groups, T)
    mean = jnp.mean(g, axis=(2, 3), keepdims=True)
    var = jnp.var(g, axis=(2, 3), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, C, T) * w[None, :, None] + b[None, :, None]


def _gn_block(p, x, groups=8):
    y = conv1d(p["conv"], x, padding=1)
    y = _group_norm8(y, p["gn_w"], p["gn_b"], groups)
    return _mish(y)


def _gn_resnet(p, x, t_emb):
    h = _gn_block(p["block1"], x)
    h = h + linear(p["mlp"], _mish(t_emb))[:, :, None]
    h = _gn_block(p["block2"], h)
    return h + conv1d(p["res_conv"], x)


def _est_attention(p, cfg, x):
    B, T, _ = x.shape
    H, hd = cfg.est_heads, cfg.est_head_dim
    q = linear(p["to_q"], x).reshape(B, T, H, hd)
    k = linear(p["to_k"], x).reshape(B, T, H, hd)
    v = linear(p["to_v"], x).reshape(B, T, H, hd)
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, H * hd)
    return linear(p["to_out"], out)


def _tblock(p, cfg, x):
    h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=1e-5)
    x = x + _est_attention(p["attn1"], cfg, h)
    h = layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=1e-5)
    ff = linear(p["ff"]["out"],
                jax.nn.gelu(linear(p["ff"]["proj"], h), approximate=False))
    return x + ff


def _estimator(est, cfg: GLMFlowConfig, x, mu, t_scalar, spks, cond):
    B, _, T = x.shape
    half = cfg.est_in // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    te = 1000.0 * t_scalar[:, None] * freqs[None]
    te = jnp.concatenate([jnp.sin(te), jnp.cos(te)], axis=-1)
    t_emb = linear(est["time_mlp"]["linear_2"],
                   jax.nn.silu(linear(est["time_mlp"]["linear_1"], te)))

    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spks[:, :, None], (B, spks.shape[1], T)),
         cond], axis=1)

    hiddens = []
    n_down = len(est["down"])
    for i, dp in enumerate(est["down"]):
        h = _gn_resnet(dp["resnet"], h, t_emb)
        ht = h.transpose(0, 2, 1)
        for bp in dp["blocks"]:
            ht = _tblock(bp, cfg, ht)
        h = ht.transpose(0, 2, 1)
        hiddens.append(h)
        if i != n_down - 1:  # Downsample1D stride 2 (last level: plain conv)
            h = conv1d(dp["downsample"], h, stride=2, padding=1)
        else:
            h = conv1d(dp["downsample"], h, padding=1)

    for mp in est["mid"]:
        h = _gn_resnet(mp["resnet"], h, t_emb)
        ht = h.transpose(0, 2, 1)
        for bp in mp["blocks"]:
            ht = _tblock(bp, cfg, ht)
        h = ht.transpose(0, 2, 1)

    n_up = len(est["up"])
    for i, upb in enumerate(est["up"]):
        skip = hiddens.pop()
        h = jnp.concatenate([h[:, :, :skip.shape[-1]], skip], axis=1)
        h = _gn_resnet(upb["resnet"], h, t_emb)
        ht = h.transpose(0, 2, 1)
        for bp in upb["blocks"]:
            ht = _tblock(bp, cfg, ht)
        h = ht.transpose(0, 2, 1)
        if i != n_up - 1:  # torch ConvTranspose1d(4, 2, padding=1)
            h = conv_transpose1d(upb["upsample"], h, stride=2, padding=1)
        else:
            h = conv1d(upb["upsample"], h, padding=1)

    h = _gn_block(est["final_block"], h)
    return conv1d(est["final_proj"], h)


def glm_flow_forward(params: dict, cfg: GLMFlowConfig, tokens: jax.Array,
                     spk: jax.Array, rng: jax.Array,
                     noise: jax.Array | None = None) -> jax.Array:
    """tokens (B, T) int32, spk (B, spk_dim) -> mel (B, 80, feat_len(T)).

    GLMFlowModel.inference (glm.py:2064-2113)."""
    B, T = tokens.shape
    d = cfg.output_size

    spk_n = spk / jnp.maximum(jnp.linalg.norm(spk, axis=1, keepdims=True),
                              1e-12)
    spk_e = linear(params["spk_embed_affine_layer"], spk_n)

    emb = jnp.take(params["input_embedding"],
                   jnp.clip(tokens, 0, cfg.vocab_size - 1), axis=0)
    enc = params["encoder"]
    x = linear(enc["embed_out"], emb)
    x = layer_norm(x, enc["embed_norm"]["w"], enc["embed_norm"]["b"], eps=1e-5)
    x = x * math.sqrt(d)
    pos_emb = jnp.asarray(_rel_pos_emb(d, T))

    # block attention: causal OR same block of block_size tokens
    # (glm.py:458-485 _create_grid_mask with fill_triangle=True)
    p = np.arange(T)
    mask_np = (p[None, :] <= p[:, None]) | (p[None, :] // cfg.block_size
                                            == p[:, None] // cfg.block_size)
    mask = jnp.tile(jnp.asarray(mask_np)[None], (B, 1, 1))

    for lp in enc["encoders"]:
        x = _conformer_layer(lp, cfg, x, pos_emb, mask)
    x = layer_norm(x, enc["after_norm"]["w"], enc["after_norm"]["b"], eps=1e-5)
    h = linear(params["encoder_proj"], x)                     # (B, T, 80)

    # InterpolateRegulator: nearest resize to feat_len + conv/GN/Mish stack
    F = cfg.feat_len(T)
    idx = (jnp.arange(F) * T // F).astype(jnp.int32)          # nearest
    hm = jnp.take(h.transpose(0, 2, 1), idx, axis=2)          # (B, 80, F)
    reg = params["length_regulator"]
    for cp in reg["convs"]:
        hm = conv1d(cp["conv"], hm, padding=1)
        hm = _group_norm8(hm, cp["gn_w"], cp["gn_b"], groups=1)
        hm = _mish(hm)
    mu = conv1d(reg["out"], hm)                               # (B, 80, F)

    conds = jnp.zeros_like(mu)
    if noise is None:
        noise = jax.random.normal(rng, mu.shape).astype(mu.dtype)
    x = noise

    ts = jnp.linspace(0.0, 1.0, cfg.n_timesteps + 1)
    ts = 1.0 - jnp.cos(ts * 0.5 * jnp.pi)
    est = params["estimator"]
    zeros_mu = jnp.zeros_like(mu)
    zeros_spk = jnp.zeros_like(spk_e)
    zeros_cond = jnp.zeros_like(conds)
    for step in range(1, cfg.n_timesteps + 1):
        t = ts[step - 1]
        dt = ts[step] - ts[step - 1]
        t_in = jnp.full((B,), t, mu.dtype)
        d_cond = _estimator(est, cfg, x, mu, t_in, spk_e, conds)
        d_unc = _estimator(est, cfg, x, zeros_mu, t_in, zeros_spk, zeros_cond)
        dphi = (1.0 + cfg.cfg_rate) * d_cond - cfg.cfg_rate * d_unc
        x = x + dt * dphi
    return x
