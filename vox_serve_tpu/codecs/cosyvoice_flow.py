"""CosyVoice2 flow-matching token->mel decoder, weight-exact.

Faithful JAX re-implementation of the reference CausalMaskedDiffWithXvec
(tokenizer/cosyvoice_flow.py:2847): token embedding + speaker affine ->
UpsampleConformerEncoder (6 rel-pos conformer blocks @25 Hz, x2 nearest
upsample, 4 more blocks @50 Hz, cosyvoice_flow.py:1022) -> encoder_proj ->
CausalConditionalCFM (10-step cosine Euler solver with CFG rate 0.7,
cosyvoice_flow.py:2595) whose estimator is the causal U-Net
CausalConditionalDecoder (down[256] + 12 mid + up blocks, each a causal
resnet + 4 diffusers-style transformer blocks, cosyvoice_flow.py:2231).

The param pytree mirrors the torch module names so ``load_cosy_flow_params``
is a mechanical walk of the published state_dict (CosyVoice2 flow.pt /
Chatterbox s3gen). Golden parity vs the reference torch module is asserted in
tests/test_cosy_flow_parity.py.

Streaming on TPU is LEFT-CONTEXT RECOMPUTE rather than the reference's
per-layer KV/CNN cache pytrees (10 timesteps x 64 attention layers of cache
per slot would dominate HBM): each detokenize window re-decodes a bounded
token context and keeps only the new frames. Attention is chunk-local under
the reference's streaming masks (static chunk 25/50), so a context >= one
chunk reproduces the reference's effective receptive field.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbone import _init_linear, linear
from ..ops.norms import layer_norm
from .layers import conv1d, conv_transpose1d, init_conv1d, init_conv_transpose1d


@dataclasses.dataclass(frozen=True)
class CosyFlowConfig:
    input_size: int = 512
    output_size: int = 512
    heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    up_blocks: int = 4
    vocab_size: int = 6561
    spk_dim: int = 192
    mel_dim: int = 80
    token_mel_ratio: int = 2
    pre_lookahead: int = 3
    static_chunk_size: int = 25
    # estimator (CausalConditionalDecoder defaults)
    est_channels: int = 256
    est_head_dim: int = 64
    est_heads: int = 8
    est_n_blocks: int = 4
    est_mid_blocks: int = 12
    est_static_chunk: int = 50
    n_timesteps: int = 10
    cfg_rate: float = 0.7

    @property
    def upsample(self) -> int:  # model-facing: mel frames per token
        return self.token_mel_ratio

    @property
    def est_in(self) -> int:  # x + mu + spks + cond
        return self.mel_dim * 4

    @property
    def time_embed_dim(self) -> int:
        return self.est_channels * 4


# ---------------------------------------------------------------------------
# init (pytree mirrors the torch module names)
# ---------------------------------------------------------------------------


def _lin(key, din, dout, bias=True):
    return _init_linear(key, din, dout, jnp.float32, bias=bias)


def init_cosy_flow(cfg: CosyFlowConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 2048))

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

    def causal_block(din, dout):
        return {"conv": init_conv1d(nk(), din, dout, 3), "norm": ln(dout)}

    def causal_resnet(din, dout):
        return {
            "mlp": _lin(nk(), cfg.time_embed_dim, dout),
            "block1": causal_block(din, dout),
            "block2": causal_block(dout, dout),
            "res_conv": init_conv1d(nk(), din, dout, 1),
        }

    def est_transformer_block(dim):
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
            "ff": {
                "proj": _lin(nk(), dim, 4 * dim),
                "out": _lin(nk(), 4 * dim, dim),
            },
        }

    ch = cfg.est_channels
    est = {
        "time_mlp": {
            "linear_1": _lin(nk(), cfg.est_in, cfg.time_embed_dim),
            "linear_2": _lin(nk(), cfg.time_embed_dim, cfg.time_embed_dim),
        },
        "down": [{
            "resnet": causal_resnet(cfg.est_in, ch),
            "blocks": [est_transformer_block(ch)
                       for _ in range(cfg.est_n_blocks)],
            "downsample": init_conv1d(nk(), ch, ch, 3),  # causal (is_last)
        }],
        "mid": [{
            "resnet": causal_resnet(ch, ch),
            "blocks": [est_transformer_block(ch)
                       for _ in range(cfg.est_n_blocks)],
        } for _ in range(cfg.est_mid_blocks)],
        "up": [{
            "resnet": causal_resnet(ch * 2, ch),
            "blocks": [est_transformer_block(ch)
                       for _ in range(cfg.est_n_blocks)],
            "upsample": init_conv1d(nk(), ch, ch, 3),    # causal (is_last)
        }],
        "final_block": causal_block(ch, ch),
        "final_proj": init_conv1d(nk(), ch, cfg.mel_dim, 1),
    }

    return {
        "input_embedding": (jax.random.normal(
            nk(), (cfg.vocab_size, cfg.input_size)) * 0.02),
        "spk_embed_affine_layer": _lin(nk(), cfg.spk_dim, cfg.mel_dim),
        "encoder": {
            "embed_out": _lin(nk(), cfg.input_size, d),
            "embed_norm": ln(d),
            "up_embed_out": _lin(nk(), cfg.input_size, d),
            "up_embed_norm": ln(d),
            "pre_lookahead": {
                "conv1": init_conv1d(nk(), d, d, cfg.pre_lookahead + 1),
                "conv2": init_conv1d(nk(), d, d, 3),
            },
            "encoders": [conformer_layer() for _ in range(cfg.num_blocks)],
            "up_layer_conv": init_conv1d(nk(), d, d, 5),
            "up_encoders": [conformer_layer() for _ in range(cfg.up_blocks)],
            "after_norm": ln(d),
        },
        "encoder_proj": _lin(nk(), d, cfg.mel_dim),
        "estimator": est,
    }


# ---------------------------------------------------------------------------
# weight mapping
# ---------------------------------------------------------------------------


def load_cosy_flow_params(sd: dict, cfg: CosyFlowConfig,
                          prefix: str = "") -> dict:
    """Map the published flow checkpoint (CosyVoice2 flow.pt layout =
    CausalMaskedDiffWithXvec.state_dict(); Chatterbox s3gen uses the same
    module under a ``flow.`` prefix) onto the JAX pytree."""
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

    def causal_block(pre):
        return {"conv": conv(f"{pre}.block.0"), "norm": ln(f"{pre}.block.2")}

    def causal_resnet(pre):
        return {
            "mlp": lin(f"{pre}.mlp.1"),
            "block1": causal_block(f"{pre}.block1"),
            "block2": causal_block(f"{pre}.block2"),
            "res_conv": conv(f"{pre}.res_conv"),
        }

    def est_transformer_block(pre):
        return {
            "norm1": ln(f"{pre}.norm1"),
            "attn1": {
                "to_q": lin(f"{pre}.attn1.to_q", bias=False),
                "to_k": lin(f"{pre}.attn1.to_k", bias=False),
                "to_v": lin(f"{pre}.attn1.to_v", bias=False),
                "to_out": lin(f"{pre}.attn1.to_out.0"),
            },
            "norm3": ln(f"{pre}.norm3"),
            "ff": {
                "proj": lin(f"{pre}.ff.net.0.proj"),
                "out": lin(f"{pre}.ff.net.2"),
            },
        }

    e = "decoder.estimator"
    est = {
        "time_mlp": {
            "linear_1": lin(f"{e}.time_mlp.linear_1"),
            "linear_2": lin(f"{e}.time_mlp.linear_2"),
        },
        "down": [{
            "resnet": causal_resnet(f"{e}.down_blocks.0.0"),
            "blocks": [est_transformer_block(f"{e}.down_blocks.0.1.{j}")
                       for j in range(cfg.est_n_blocks)],
            "downsample": conv(f"{e}.down_blocks.0.2"),
        }],
        "mid": [{
            "resnet": causal_resnet(f"{e}.mid_blocks.{i}.0"),
            "blocks": [est_transformer_block(f"{e}.mid_blocks.{i}.1.{j}")
                       for j in range(cfg.est_n_blocks)],
        } for i in range(cfg.est_mid_blocks)],
        "up": [{
            "resnet": causal_resnet(f"{e}.up_blocks.0.0"),
            "blocks": [est_transformer_block(f"{e}.up_blocks.0.1.{j}")
                       for j in range(cfg.est_n_blocks)],
            "upsample": conv(f"{e}.up_blocks.0.2"),
        }],
        "final_block": causal_block(f"{e}.final_block"),
        "final_proj": conv(f"{e}.final_proj"),
    }

    return {
        **load_cosy_encoder_section(sd, cfg, prefix),
        "estimator": est,
    }




def load_cosy_encoder_section(sd: dict, cfg: CosyFlowConfig,
                              prefix: str = "") -> dict:
    """Shared mapping of the non-estimator parts (input embedding, speaker
    affine, upsample conformer encoder, encoder_proj) — identical key layout
    in CosyVoice2 flow.pt, Chatterbox s3gen, and Step-Audio-2 token2wav
    (UpsampleConformerEncoderV2 reuses the same module names)."""
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

    enc = "encoder"
    return {
        "input_embedding": arr("input_embedding.weight"),
        "spk_embed_affine_layer": lin("spk_embed_affine_layer"),
        "encoder": {
            "embed_out": lin(f"{enc}.embed.out.0"),
            "embed_norm": ln(f"{enc}.embed.out.1"),
            "up_embed_out": lin(f"{enc}.up_embed.out.0"),
            "up_embed_norm": ln(f"{enc}.up_embed.out.1"),
            "pre_lookahead": {
                "conv1": conv(f"{enc}.pre_lookahead_layer.conv1"),
                "conv2": conv(f"{enc}.pre_lookahead_layer.conv2"),
            },
            "encoders": [conformer_layer(f"{enc}.encoders.{i}")
                         for i in range(cfg.num_blocks)],
            "up_layer_conv": conv(f"{enc}.up_layer.conv"),
            "up_encoders": [conformer_layer(f"{enc}.up_encoders.{i}")
                            for i in range(cfg.up_blocks)],
            "after_norm": ln(f"{enc}.after_norm"),
        },
        "encoder_proj": lin("encoder_proj"),
    }


# ---------------------------------------------------------------------------
# conformer encoder
# ---------------------------------------------------------------------------


def _rel_pos_emb(d: int, T: int) -> np.ndarray:
    """Espnet relative positional encoding window for length T: rows are
    relative distances T-1 .. -(T-1) with interleaved sin/cos
    (cosyvoice_flow.py:399-489)."""
    rel = np.arange(T - 1, -T, -1, dtype=np.float64)          # (2T-1,)
    div = np.exp(np.arange(0, d, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d))
    pe = np.zeros((2 * T - 1, d), np.float64)
    pe[:, 0::2] = np.sin(rel[:, None] * div[None, :])
    pe[:, 1::2] = np.cos(np.abs(rel)[:, None] * div[None, :])
    return pe.astype(np.float32)[None]                        # (1, 2T-1, d)


def _rel_shift(x: jax.Array) -> jax.Array:
    """(B, H, T, 2T-1) -> (B, H, T, T): espnet rel-shift trick."""
    B, H, T, _ = x.shape
    zero = jnp.zeros((B, H, T, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1).reshape(B, H, 2 * T, T)
    return xp[:, :, 1:].reshape(B, H, T, 2 * T - 1)[:, :, :, :T]


def _rel_attention(p: dict, cfg: CosyFlowConfig, x: jax.Array,
                   pos_emb: jax.Array, mask: jax.Array) -> jax.Array:
    """RelPositionMultiHeadedAttention (cosyvoice_flow.py:742-865).
    x (B, T, d); pos_emb (1, 2T-1, d); mask (B, T, T) bool."""
    B, T, d = x.shape
    H = cfg.heads
    dk = d // H
    q = linear(p["linear_q"], x).reshape(B, T, H, dk)
    k = linear(p["linear_k"], x).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    v = linear(p["linear_v"], x).reshape(B, T, H, dk).transpose(0, 2, 1, 3)
    pe = linear(p["linear_pos"], pos_emb).reshape(
        1, -1, H, dk).transpose(0, 2, 1, 3)                   # (1, H, 2T-1, dk)

    q_u = (q + p["pos_bias_u"][None, None]).transpose(0, 2, 1, 3)
    q_v = (q + p["pos_bias_v"][None, None]).transpose(0, 2, 1, 3)
    ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k)                # (B, H, T, T)
    bd = jnp.einsum("bhtd,bhsd->bhts", q_v,
                    jnp.broadcast_to(pe, (B,) + pe.shape[1:]))
    bd = _rel_shift(bd)                                       # (B, H, T, T)
    scores = (ac + bd) / math.sqrt(dk)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None], scores, neg)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(mask[:, None], attn, 0.0)
    out = jnp.einsum("bhts,bhsd->bthd", attn, v).reshape(B, T, d)
    return linear(p["linear_out"], out)


def _conformer_layer(p: dict, cfg: CosyFlowConfig, x, pos_emb, mask):
    h = layer_norm(x, p["norm_mha"]["w"], p["norm_mha"]["b"], eps=1e-12)
    x = x + _rel_attention(p["self_attn"], cfg, h, pos_emb, mask)
    h = layer_norm(x, p["norm_ff"]["w"], p["norm_ff"]["b"], eps=1e-12)
    ff = linear(p["feed_forward"]["w_2"],
                jax.nn.silu(linear(p["feed_forward"]["w_1"], h)))
    return x + ff


def _chunk_mask(T: int, chunk: int) -> np.ndarray:
    """Block-causal streaming mask (subsequent_chunk_mask with all left
    chunks, cosyvoice_flow.py:273-302)."""
    pos = np.arange(T)
    block = (pos // chunk + 1) * chunk
    return (pos[None, :] < block[:, None])


def _encoder_forward(params: dict, cfg: CosyFlowConfig, token_emb: jax.Array,
                     valid: jax.Array, streaming: bool,
                     context: int = 0) -> jax.Array:
    """token_emb (B, T, input_size), valid (B, T) bool -> (B, 2(T-context), d).

    UpsampleConformerEncoder.forward. ``context=0`` is finalize=True
    (zero-padded lookahead, cosyvoice_flow.py:1110-1170); ``context=k``
    treats the LAST k tokens as real lookahead for the pre-lookahead conv
    only — they feed conv1 but are dropped before the attention stack
    (finalize=False semantics; also Step-Audio-2's
    UpsampleConformerEncoderV2.forward_chunk)."""
    enc = params["encoder"]
    B, T, _ = token_emb.shape
    d = cfg.output_size

    x = linear(enc["embed_out"], token_emb)
    x = layer_norm(x, enc["embed_norm"]["w"], enc["embed_norm"]["b"], eps=1e-5)
    x = x * math.sqrt(d)

    # pre-lookahead: conv1 sees `pre_lookahead` future tokens (real context
    # for the last `context`, zero-padding beyond); conv2 is causal;
    # residual on the body (cosyvoice_flow.py:561-605)
    pl = enc["pre_lookahead"]
    xt = x.transpose(0, 2, 1)
    y = jnp.pad(xt, ((0, 0), (0, 0), (0, cfg.pre_lookahead - context)))
    y = jax.nn.leaky_relu(conv1d(pl["conv1"], y), 0.01)
    y = jnp.pad(y, ((0, 0), (0, 0), (2, 0)))
    y = conv1d(pl["conv2"], y)
    T = T - context
    x = x[:, :T] + y.transpose(0, 2, 1)
    valid = valid[:, :T]

    pos_emb = jnp.asarray(_rel_pos_emb(d, T))
    key_mask = valid[:, None, :]                              # (B, 1, T)
    if streaming:
        cm = jnp.asarray(_chunk_mask(T, cfg.static_chunk_size))[None]
        mask = key_mask & cm
    else:
        mask = jnp.broadcast_to(key_mask, (B, T, T))

    for lp in enc["encoders"]:
        x = _conformer_layer(lp, cfg, x, pos_emb, mask)

    # x2 nearest upsample + conv k=5 left-padded by 4 (Upsample1D,
    # cosyvoice_flow.py:533-560)
    xt = x.transpose(0, 2, 1)
    xt = jnp.repeat(xt, 2, axis=-1)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (4, 0)))
    xt = conv1d(enc["up_layer_conv"], xt)
    x = xt.transpose(0, 2, 1)                                 # (B, 2T, d)

    T2 = 2 * T
    x = linear(enc["up_embed_out"], x)
    x = layer_norm(x, enc["up_embed_norm"]["w"], enc["up_embed_norm"]["b"],
                   eps=1e-5)
    x = x * math.sqrt(d)
    pos_emb2 = jnp.asarray(_rel_pos_emb(d, T2))
    valid2 = jnp.repeat(valid, 2, axis=-1)
    key_mask2 = valid2[:, None, :]
    if streaming:
        cm2 = jnp.asarray(_chunk_mask(T2, cfg.static_chunk_size * 2))[None]
        mask2 = key_mask2 & cm2
    else:
        mask2 = jnp.broadcast_to(key_mask2, (B, T2, T2))

    for lp in enc["up_encoders"]:
        x = _conformer_layer(lp, cfg, x, pos_emb2, mask2)

    return layer_norm(x, enc["after_norm"]["w"], enc["after_norm"]["b"],
                      eps=1e-5)


# ---------------------------------------------------------------------------
# estimator (causal U-Net)
# ---------------------------------------------------------------------------


def _causal_conv3(p, x):
    return conv1d(p, jnp.pad(x, ((0, 0), (0, 0), (2, 0))))


def _causal_block(p, x, mask):
    y = _causal_conv3(p["conv"], x * mask)
    y = layer_norm(y.transpose(0, 2, 1), p["norm"]["w"], p["norm"]["b"],
                   eps=1e-5).transpose(0, 2, 1)
    y = y * jnp.tanh(jax.nn.softplus(y))                      # mish
    return y * mask


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _resnet(p, x, mask, t_emb):
    """CausalResnetBlock1D (cosyvoice_flow.py:1989-2012)."""
    h = _causal_block(p["block1"], x, mask)
    h = h + linear(p["mlp"], _mish(t_emb))[:, :, None]
    h = _causal_block(p["block2"], h, mask)
    return h + conv1d(p["res_conv"], x * mask)


def _est_attention(p, cfg: CosyFlowConfig, x, mask):
    """diffusers Attention (cosyvoice_flow.py:118-175). x (B, T, C)."""
    B, T, _ = x.shape
    q = linear(p["to_q"], x)
    k = linear(p["to_k"], x)
    v = linear(p["to_v"], x)
    inner = q.shape[-1]
    H = cfg.est_heads
    hd = inner // H
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, H, hd)
    v = v.reshape(B, T, H, hd)
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask[:, None], scores, neg)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, inner)
    return linear(p["to_out"], out)


def _est_transformer_block(p, cfg: CosyFlowConfig, x, mask):
    h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"], eps=1e-5)
    x = x + _est_attention(p["attn1"], cfg, h, mask)
    h = layer_norm(x, p["norm3"]["w"], p["norm3"]["b"], eps=1e-5)
    ff = linear(p["ff"]["out"],
                jax.nn.gelu(linear(p["ff"]["proj"], h), approximate=False))
    return x + ff


def _estimator_forward(est: dict, cfg: CosyFlowConfig, x, mask, mu, t_scalar,
                       spks, cond, streaming: bool):
    """ConditionalDecoder.forward (cosyvoice_flow.py:2360-2447).
    x/mu/cond (B, 80, T); mask (B, 1, T); t_scalar (B,); spks (B, 80)."""
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
         cond], axis=1)                                        # (B, 320, T)

    def attn_mask(valid_1t, chunk):
        v = valid_1t[:, 0]                                     # (B, T')
        km = v[:, None, :]
        if streaming:
            cm = jnp.asarray(_chunk_mask(v.shape[1], chunk))[None]
            return km & cm
        return jnp.broadcast_to(km, (B, v.shape[1], v.shape[1]))

    masks = [mask.astype(bool)]
    hiddens = []
    # down (single level; downsample is a causal conv, no stride)
    d0 = est["down"][0]
    h = _resnet(d0["resnet"], h, masks[-1], t_emb)
    am = attn_mask(masks[-1], cfg.est_static_chunk)
    ht = h.transpose(0, 2, 1)
    for bp in d0["blocks"]:
        ht = _est_transformer_block(bp, cfg, ht, am)
    h = ht.transpose(0, 2, 1)
    hiddens.append(h)
    h = _causal_conv3(d0["downsample"], h * masks[-1])
    masks.append(masks[-1][:, :, ::2])
    masks = masks[:-1]
    mask_mid = masks[-1]

    for mp in est["mid"]:
        h = _resnet(mp["resnet"], h, mask_mid, t_emb)
        am = attn_mask(mask_mid, cfg.est_static_chunk)
        ht = h.transpose(0, 2, 1)
        for bp in mp["blocks"]:
            ht = _est_transformer_block(bp, cfg, ht, am)
        h = ht.transpose(0, 2, 1)

    u0 = est["up"][0]
    mask_up = masks.pop()
    skip = hiddens.pop()
    h = jnp.concatenate([h[:, :, :skip.shape[-1]], skip], axis=1)
    h = _resnet(u0["resnet"], h, mask_up, t_emb)
    am = attn_mask(mask_up, cfg.est_static_chunk)
    ht = h.transpose(0, 2, 1)
    for bp in u0["blocks"]:
        ht = _est_transformer_block(bp, cfg, ht, am)
    h = ht.transpose(0, 2, 1)
    h = _causal_conv3(u0["upsample"], h * mask_up)

    h = _causal_block(est["final_block"], h, mask_up)
    out = conv1d(est["final_proj"], h * mask_up)
    return out * mask


# ---------------------------------------------------------------------------
# CFM euler solver + top level
# ---------------------------------------------------------------------------


def cosy_flow_forward(params: dict, cfg: CosyFlowConfig, tokens: jax.Array,
                      valid: jax.Array, spk: jax.Array, conds: jax.Array,
                      rng: jax.Array, streaming: bool = True,
                      noise: jax.Array | None = None) -> jax.Array:
    """tokens (B, T) int32; valid (B, T) bool; spk (B, spk_dim) x-vector;
    conds (B, 2T, mel) prompt-mel anchor rows (zeros elsewhere) ->
    mel (B, mel_dim, 2T).

    CausalMaskedDiffWithXvec.forward with finalize=True + the 10-step cosine
    Euler CFG solver (cosyvoice_flow.py:2875-2908, 2799-2846)."""
    B, T = tokens.shape
    spk_n = spk / jnp.maximum(jnp.linalg.norm(spk, axis=1, keepdims=True),
                              1e-12)
    spk_e = linear(params["spk_embed_affine_layer"], spk_n)    # (B, 80)

    emb = jnp.take(params["input_embedding"],
                   jnp.clip(tokens, 0, cfg.vocab_size - 1), axis=0)
    emb = emb * valid[:, :, None]
    h = _encoder_forward(params, cfg, emb, valid, streaming)   # (B, 2T, d)
    mu = linear(params["encoder_proj"], h).transpose(0, 2, 1)  # (B, 80, 2T)

    T2 = 2 * T
    mask = jnp.repeat(valid, 2, axis=-1)[:, None, :].astype(mu.dtype)
    cond = conds.transpose(0, 2, 1).astype(mu.dtype)           # (B, 80, 2T)

    # single noise broadcast over batch (reference: identical start)
    if noise is None:
        noise = jax.random.normal(rng, (1, cfg.mel_dim, T2)).astype(mu.dtype)
    x = jnp.broadcast_to(noise, (B, cfg.mel_dim, T2))

    ts = jnp.linspace(0.0, 1.0, cfg.n_timesteps + 1)
    ts = 1.0 - jnp.cos(ts * 0.5 * jnp.pi)                      # cosine sched

    zeros_mu = jnp.zeros_like(mu)
    zeros_spk = jnp.zeros_like(spk_e)
    zeros_cond = jnp.zeros_like(cond)
    est = params["estimator"]
    for step in range(1, cfg.n_timesteps + 1):
        t = ts[step - 1]
        dt = ts[step] - ts[step - 1]
        x_in = jnp.concatenate([x, x], axis=0)
        mu_in = jnp.concatenate([mu, zeros_mu], axis=0)
        spk_in = jnp.concatenate([spk_e, zeros_spk], axis=0)
        cond_in = jnp.concatenate([cond, zeros_cond], axis=0)
        mask_in = jnp.concatenate([mask, mask], axis=0)
        t_in = jnp.full((2 * B,), t, mu.dtype)
        dphi = _estimator_forward(est, cfg, x_in, mask_in, mu_in, t_in,
                                  spk_in, cond_in, streaming)
        cond_d, uncond_d = dphi[:B], dphi[B:]
        dphi = (1.0 + cfg.cfg_rate) * cond_d - cfg.cfg_rate * uncond_d
        x = x + dt * dphi
    return x
