"""Shared detokenize path for models whose decoder is the CosyVoice-family
flow (CosyVoice2, Chatterbox): weight-exact flow (codecs/cosyvoice_flow.py)
+ streaming HiFT, with TPU-first left-context recompute.

Per-slot codec cache:
  ctx_tokens (K,) int32   rolling left context (right-aligned)
  tok_pos    ()   int32   stream tokens consumed so far (step tokens)
  spk        (spk_dim,)   raw x-vector (flow applies the affine + normalize)
  prompt_feat (P, mel)    prompt-mel anchor rows (CFM cond, reference
                          cosyvoice_flow.py:2893-2896); zeros when no clone
  prompt_len ()   int32
  hift       {...}        streaming HiFT caches (codecs/hifigan.py)

Each window re-decodes [ctx, window] with the reference streaming masks and
keeps the last (window - overlap) * 2 mel frames; ctx >= one encoder chunk
(static_chunk_size) reproduces the reference's chunk-local receptive field
without per-layer KV/CNN cache pytrees (10 timesteps x 64 attention layers
of device state per slot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..codecs.cosyvoice_flow import CosyFlowConfig, cosy_flow_forward
from ..codecs.hifigan import hift_decode, hift_decode_chunk, init_hift_cache


class CosyFlowDecodeMixin:
    """Requires: self._flow_cfg (CosyFlowConfig), self._hift_cfg,
    self.detokenize_overlap, and codec_params {"flow", "hift"}."""

    #: left-context tokens carried between windows (one encoder chunk)
    FLOW_CTX_TOKENS = 25
    #: static prompt-feat rows per slot (cond anchor for voice cloning)
    FLOW_PROMPT_FRAMES = 300

    def _flow_token_column(self, token_ids: jax.Array) -> jax.Array:
        """(B, W, C) -> (B, W) flow-vocab token ids; models override to
        shift/clip their LM vocab into the codec vocab."""
        return jnp.clip(token_ids[:, :, 0], 0, self._flow_cfg.vocab_size - 1)

    def detokenize(self, codec_params, token_ids, cache):
        cfg: CosyFlowConfig = self._flow_cfg
        tokens = self._flow_token_column(token_ids)          # (B, W)
        B, W = tokens.shape
        K = self.FLOW_CTX_TOKENS
        step = W - self.detokenize_overlap
        rng = jax.random.key(0)

        if cache is None:
            valid = jnp.ones((B, W), bool)
            conds = jnp.zeros((B, 2 * W, cfg.mel_dim))
            spk = jnp.zeros((B, cfg.spk_dim))
            mel = cosy_flow_forward(codec_params["flow"], cfg, tokens, valid,
                                    spk, conds, rng, streaming=True)
            # emit the FIRST step tokens (windows tile [i*step, i*step+W)
            # from 0; the trailing `overlap` tokens are lookahead context)
            keep = step * cfg.token_mel_ratio
            wav, _ = hift_decode(codec_params["hift"], self._hift_cfg,
                                 mel[:, :, :keep])
            return wav[:, None, :], None

        ctx = cache["ctx_tokens"]                            # (B, K)
        tok_pos = cache["tok_pos"]                           # (B,)
        toks_in = jnp.concatenate([ctx, tokens], axis=1)     # (B, K+W)
        pos_tok = tok_pos[:, None] + jnp.arange(K + W,
                                                dtype=jnp.int32)[None] - K
        valid = pos_tok >= 0

        # prompt-mel cond rows where the global mel frame < prompt_len
        r = cfg.token_mel_ratio
        pos_mel = (jnp.repeat(pos_tok, r, axis=1) * r
                   + jnp.tile(jnp.arange(r, dtype=jnp.int32),
                              (K + W,))[None])               # (B, r*(K+W))
        pf = cache["prompt_feat"]                            # (B, P, mel)
        idx = jnp.clip(pos_mel, 0, pf.shape[1] - 1)
        conds = jnp.take_along_axis(pf, idx[:, :, None], axis=1)
        in_prompt = ((pos_mel >= 0)
                     & (pos_mel < cache["prompt_len"][:, None]))
        conds = conds * in_prompt[:, :, None]

        mel = cosy_flow_forward(codec_params["flow"], cfg, toks_in, valid,
                                cache["spk"], conds, rng, streaming=True)
        # emit the FIRST step tokens OF THE WINDOW (after the K ctx tokens):
        # scheduler windows tile [i*step, i*step + W) from token 0, and the
        # window's trailing `overlap` tokens act as real lookahead for the
        # emitted region (the old keep-last-step convention permanently
        # dropped tokens [0, overlap) — the first ~120 ms of every stream —
        # and emitted zero-lookahead tails at every chunk boundary)
        keep = step * r
        mel = mel[:, :, K * r: K * r + keep]
        wav, new_hift = hift_decode_chunk(codec_params["hift"],
                                          self._hift_cfg, mel, cache["hift"])

        new_ctx = jnp.concatenate([ctx, tokens[:, :step]], axis=1)[:, -K:]
        new_cache = dict(cache)
        new_cache["ctx_tokens"] = new_ctx
        new_cache["tok_pos"] = tok_pos + step
        new_cache["hift"] = new_hift
        return wav[:, None, :], new_cache

    def make_flow_cache_row(self, spk=None, prompt_feat=None,
                            prompt_tokens=None):
        """Per-slot cache initialization row (PreprocessOutput.
        decoder_cache_init): zero caches with the request's x-vector,
        prompt-mel anchor, and prompt speech tokens filled in.

        prompt_tokens seed the flow token context AND offset tok_pos, so
        the prompt mel rows anchor the PROMPT's positions (reference
        inpainting setup: prompt tokens + prompt mel at [0, P), generation
        appended after). Without them the prompt mel anchored over
        GENERATED-token positions, pulling the first seconds of every
        utterance toward replicating the prompt recording."""
        row = jax.tree.map(lambda a: a[0], self.init_decoder_cache(1))
        if spk is not None:
            row["spk"] = jnp.asarray(spk, jnp.float32)
        if prompt_tokens is not None:
            pt = jnp.asarray(prompt_tokens, jnp.int32).reshape(-1)
            pt = jnp.clip(pt, 0, self._flow_cfg.vocab_size - 1)
            K = self.FLOW_CTX_TOKENS
            k = min(pt.shape[0], K)
            if k:
                row["ctx_tokens"] = row["ctx_tokens"].at[K - k:].set(pt[-k:])
            row["tok_pos"] = jnp.asarray(int(pt.shape[0]), jnp.int32)
        if prompt_feat is not None:
            pf = jnp.asarray(prompt_feat, jnp.float32)
            P = self.FLOW_PROMPT_FRAMES
            n = min(pf.shape[0], P)
            row["prompt_feat"] = row["prompt_feat"].at[:n].set(pf[:n])
            row["prompt_len"] = jnp.asarray(n, jnp.int32)
        return row

    def init_decoder_cache(self, batch):
        cfg: CosyFlowConfig = self._flow_cfg
        return {
            "ctx_tokens": jnp.zeros((batch, self.FLOW_CTX_TOKENS), jnp.int32),
            "tok_pos": jnp.zeros((batch,), jnp.int32),
            "spk": jnp.zeros((batch, cfg.spk_dim)),
            "prompt_feat": jnp.zeros(
                (batch, self.FLOW_PROMPT_FRAMES, cfg.mel_dim)),
            "prompt_len": jnp.zeros((batch,), jnp.int32),
            "hift": init_hift_cache(self._hift_cfg, batch),
        }
