"""Checkpoint loading: HF sharded-safetensors -> stacked backbone pytrees.

Counterpart of the reference's parallel safetensors loader (utils.py:51-134),
plus the name mapping from HF Llama/Qwen-family layouts into this framework's
stacked-layer parameter pytree (models/backbone.py). Network access is gated:
in offline environments models fall back to random init + dev tokenizers and
set ``assets_available = False``.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .utils import get_logger

logger = get_logger("weights")


#: resolution order is offline-first: hammering a dead network with the HF
#: hub's 5x-retry backoff stalls model init by minutes. Set
#: VOX_ALLOW_DOWNLOAD=1 to permit network fetches.
def _allow_download() -> bool:
    return os.environ.get("VOX_ALLOW_DOWNLOAD", "").lower() in ("1", "true")


def resolve_model_dir(model_id: str) -> Optional[Path]:
    """Find a local checkout/cache of an HF repo; download only if enabled."""
    p = Path(model_id)
    if p.is_dir():
        return p
    try:
        from huggingface_hub import snapshot_download

        path = snapshot_download(model_id, local_files_only=True)
        return Path(path)
    except Exception:
        pass
    if _allow_download():
        try:
            from huggingface_hub import snapshot_download

            return Path(snapshot_download(model_id))
        except Exception as e:
            logger.warning("checkpoint %s download failed (%s)",
                           model_id, type(e).__name__)
    logger.warning("checkpoint %s unavailable locally; using random init",
                   model_id)
    return None


def load_safetensors_state(model_dir: Path) -> dict[str, np.ndarray]:
    """Load all *.safetensors shards in parallel into one flat dict."""
    from safetensors.numpy import load_file

    files = sorted(model_dir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    state: dict[str, np.ndarray] = {}
    with ThreadPoolExecutor(max_workers=min(8, len(files))) as ex:
        for shard in ex.map(load_file, [str(f) for f in files]):
            state.update(shard)
    return state


def load_safetensors_file(path: Path) -> dict[str, np.ndarray]:
    """Load one specific safetensors file (repos like ResembleAI/chatterbox
    ship several distinct checkpoints side by side — t3_cfg / s3gen / ve —
    that must not be merged)."""
    from safetensors.numpy import load_file

    return load_file(str(path))


def _stack(state: dict, template: str, n_layers: int,
           transpose: bool = False, dtype=jnp.bfloat16) -> jnp.ndarray:
    arrs = []
    for i in range(n_layers):
        a = state[template.format(i=i)]
        if transpose:
            a = a.T
        arrs.append(a)
    return jnp.asarray(np.stack(arrs)).astype(dtype)


def load_llama_family_backbone(
    state: dict[str, np.ndarray],
    num_layers: int,
    prefix: str = "model.",
    qkv_bias: bool = False,
    qk_norm: bool = False,
    dtype=jnp.bfloat16,
) -> dict:
    """Map HF Llama/Qwen2/Qwen3 weights into the stacked backbone pytree.

    HF linear weights are (out, in); this framework stores (in, out), hence
    the transposes. Covers: Orpheus (Llama), CosyVoice2 (Qwen2, qkv_bias),
    Qwen3-TTS talker (qk_norm), CSM backbone, GLM, Step-Audio-2.
    """
    L = num_layers
    p = prefix

    def lin(name, bias=False):
        d = {"w": _stack(state, p + "layers.{i}." + name + ".weight", L,
                         transpose=True, dtype=dtype)}
        if bias:
            d["b"] = _stack(state, p + "layers.{i}." + name + ".bias", L,
                            dtype=dtype)
        return d

    attn = {
        "q": lin("self_attn.q_proj", qkv_bias),
        "k": lin("self_attn.k_proj", qkv_bias),
        "v": lin("self_attn.v_proj", qkv_bias),
        "o": lin("self_attn.o_proj"),
    }
    if qk_norm:
        attn["q_norm"] = _stack(state, p + "layers.{i}.self_attn.q_norm.weight",
                                L, dtype=dtype)
        attn["k_norm"] = _stack(state, p + "layers.{i}.self_attn.k_norm.weight",
                                L, dtype=dtype)
    params = {
        "layers": {
            "attn": attn,
            "mlp": {
                "gate": lin("mlp.gate_proj"),
                "up": lin("mlp.up_proj"),
                "down": lin("mlp.down_proj"),
            },
            "input_norm": _stack(state, p + "layers.{i}.input_layernorm.weight",
                                 L, dtype=dtype),
            "post_norm": _stack(
                state, p + "layers.{i}.post_attention_layernorm.weight", L,
                dtype=dtype),
        },
        "final_norm": jnp.asarray(state[p + "norm.weight"]).astype(dtype),
    }
    return params


def load_glm_backbone(
    state: dict[str, np.ndarray],
    num_layers: int,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    prefix: str = "transformer.encoder.",
    dtype=jnp.bfloat16,
) -> dict:
    """Map the ChatGLM layout (zai-org/glm-4-voice-9b; reference loads it at
    model/glm_voice.py:318-323) into the stacked backbone pytree: fused
    ``self_attention.query_key_value`` split into q/k/v rows, fused
    ``mlp.dense_h_to_4h`` split into gate/up halves (swiglu order:
    chunk[0]=gate, chunk[1]=up, reference glm_voice.py:95-100)."""
    L = num_layers
    p = prefix
    qd, kd = num_heads * head_dim, num_kv_heads * head_dim

    def stack(template, transpose=False):
        return _stack(state, p + template, L, transpose=transpose,
                      dtype=dtype)

    qkv_w = np.stack([
        state[p + f"layers.{i}.self_attention.query_key_value.weight"]
        for i in range(L)])          # (L, q+2k, H)
    qkv_b = np.stack([
        state[p + f"layers.{i}.self_attention.query_key_value.bias"]
        for i in range(L)])

    def part_w(lo, hi):
        return jnp.asarray(qkv_w[:, lo:hi].transpose(0, 2, 1)).astype(dtype)

    def part_b(lo, hi):
        return jnp.asarray(qkv_b[:, lo:hi]).astype(dtype)

    h4h = np.stack([state[p + f"layers.{i}.mlp.dense_h_to_4h.weight"]
                    for i in range(L)])  # (L, 2*ffn, H)
    ffn = h4h.shape[1] // 2

    return {
        "layers": {
            "attn": {
                "q": {"w": part_w(0, qd), "b": part_b(0, qd)},
                "k": {"w": part_w(qd, qd + kd), "b": part_b(qd, qd + kd)},
                "v": {"w": part_w(qd + kd, qd + 2 * kd),
                      "b": part_b(qd + kd, qd + 2 * kd)},
                "o": {"w": stack("layers.{i}.self_attention.dense.weight",
                                 transpose=True)},
            },
            "mlp": {
                "gate": {"w": jnp.asarray(
                    h4h[:, :ffn].transpose(0, 2, 1)).astype(dtype)},
                "up": {"w": jnp.asarray(
                    h4h[:, ffn:].transpose(0, 2, 1)).astype(dtype)},
                "down": {"w": stack("layers.{i}.mlp.dense_4h_to_h.weight",
                                    transpose=True)},
            },
            "input_norm": stack("layers.{i}.input_layernorm.weight"),
            "post_norm": stack("layers.{i}.post_attention_layernorm.weight"),
        },
        "final_norm": jnp.asarray(
            state[p + "final_layernorm.weight"]).astype(dtype),
    }


def load_zonos_backbone(
    state: dict[str, np.ndarray],
    num_layers: int,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    prefix: str = "backbone.",
    dtype=jnp.bfloat16,
) -> dict:
    """Map the Zyphra/Zonos-v0.1-transformer layout (reference strict copy at
    model/zonos.py:555-571): per-layer LayerNorms with bias (norm / norm2 /
    norm_f), fused ``mixer.in_proj`` split into q/k/v rows, GLU MLP whose
    fc1 FIRST half is the up path and SECOND half the silu gate
    (zonos.py:70-74: ``y, gate = fc1(x).chunk(2)``)."""
    L = num_layers
    p = prefix
    qd, kd = num_heads * head_dim, num_kv_heads * head_dim

    in_proj = np.stack([state[p + f"layers.{i}.mixer.in_proj.weight"]
                        for i in range(L)])            # (L, q+2k, H)
    fc1 = np.stack([state[p + f"layers.{i}.mlp.fc1.weight"]
                    for i in range(L)])                # (L, 2*ffn, H)
    ffn = fc1.shape[1] // 2

    def tr(a):
        return jnp.asarray(a.transpose(0, 2, 1)).astype(dtype)

    def stack(template):
        return _stack(state, p + template, L, dtype=dtype)

    return {
        "layers": {
            "attn": {
                "q": {"w": tr(in_proj[:, :qd])},
                "k": {"w": tr(in_proj[:, qd:qd + kd])},
                "v": {"w": tr(in_proj[:, qd + kd:qd + 2 * kd])},
                "o": {"w": _stack(state,
                                  p + "layers.{i}.mixer.out_proj.weight", L,
                                  transpose=True, dtype=dtype)},
            },
            "mlp": {
                "up": {"w": tr(fc1[:, :ffn])},
                "gate": {"w": tr(fc1[:, ffn:])},
                "down": {"w": _stack(state, p + "layers.{i}.mlp.fc2.weight",
                                     L, transpose=True, dtype=dtype)},
            },
            "input_norm": stack("layers.{i}.norm.weight"),
            "input_norm_b": stack("layers.{i}.norm.bias"),
            "post_norm": stack("layers.{i}.norm2.weight"),
            "post_norm_b": stack("layers.{i}.norm2.bias"),
        },
        "final_norm": jnp.asarray(state[p + "norm_f.weight"]).astype(dtype),
        "final_norm_b": jnp.asarray(state[p + "norm_f.bias"]).astype(dtype),
    }


def load_embedding(state: dict, name: str, dtype=jnp.bfloat16) -> jnp.ndarray:
    return jnp.asarray(state[name]).astype(dtype)


def load_head(state: dict, name: str, tied_embed: Optional[str] = None,
              dtype=jnp.bfloat16) -> jnp.ndarray:
    """(V, H) HF head -> (H, V)."""
    if name in state:
        return jnp.asarray(state[name].T).astype(dtype)
    if tied_embed is not None:
        return jnp.asarray(state[tied_embed].T).astype(dtype)
    raise KeyError(name)


class DevTokenizer:
    """Deterministic char-level fallback used when the real HF tokenizer
    assets are unavailable (offline dev/test). NOT the production path —
    models expose ``assets_available`` so the server can warn."""

    def __init__(self, vocab_size: int = 128000, offset: int = 64):
        self.vocab_size = vocab_size
        self.offset = offset

    def encode(self, text: str) -> list[int]:
        return [self.offset + (ord(c) * 2654435761) % (self.vocab_size - self.offset - 1)
                for c in text]

    def __call__(self, text: str):
        return self.encode(text)


def load_text_tokenizer(model_id: str, vocab_size: int):
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_id, local_files_only=True)
        logger.info("loaded tokenizer for %s (local)", model_id)
        return tok, True
    except Exception:
        pass
    if _allow_download():
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(model_id)
            return tok, True
        except Exception as e:
            logger.warning("tokenizer %s download failed (%s)", model_id,
                           type(e).__name__)
    logger.warning("tokenizer for %s unavailable; dev fallback", model_id)
    return DevTokenizer(vocab_size), False
