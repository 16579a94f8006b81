"""Tensor-parallel sharding rules for the backbone parameter pytree.

Megatron-style: attention q/k/v and MLP gate/up shard their *output* feature
dim over 'tp' (each chip owns a head/ffn slice); o and down shard their
*input* dim, so each layer needs exactly one all-reduce per sublayer —
GSPMD derives it from these NamedShardings. Embeddings/heads shard the vocab
dim; norms are replicated. Stacked-layer params carry a leading layer axis
(always replicated).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def backbone_param_shardings(mesh: Mesh, params: dict) -> dict:
    """Build a NamedSharding pytree matching init_backbone_params output."""

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    def attn_shardings(attn: dict) -> dict:
        out = {}
        for name in ("q", "k", "v"):
            out[name] = {"w": ns(None, None, "tp")}
            if "b" in attn[name]:
                out[name]["b"] = ns(None, "tp")
        out["o"] = {"w": ns(None, "tp", None)}
        if "b" in attn["o"]:
            out["o"]["b"] = ns(None)
        if "q_norm" in attn:
            out["q_norm"] = ns(None)
            out["k_norm"] = ns(None)
        return out

    def mlp_shardings(mlp: dict) -> dict:
        out = {
            "gate": {"w": ns(None, None, "tp")},
            "up": {"w": ns(None, None, "tp")},
            "down": {"w": ns(None, "tp", None)},
        }
        for name in ("gate", "up"):
            if "b" in mlp[name]:
                out[name]["b"] = ns(None, "tp")
        if "b" in mlp["down"]:
            out["down"]["b"] = ns(None)
        return out

    shardings = {
        "layers": {
            "attn": attn_shardings(params["layers"]["attn"]),
            "mlp": mlp_shardings(params["layers"]["mlp"]),
            "input_norm": ns(None, None),
            "post_norm": ns(None, None),
        },
        "final_norm": ns(None),
    }
    # LayerNorm-bias keys (use_layer_norm models, e.g. Zonos): the sharding
    # pytree must match the param pytree's STRUCTURE or tree.map raises at
    # startup
    for key in ("input_norm_b", "post_norm_b"):
        if key in params["layers"]:
            shardings["layers"][key] = ns(None, None)
    if "final_norm_b" in params:
        shardings["final_norm_b"] = ns(None)
    if "pos_emb" in params:
        shardings["pos_emb"] = ns(None, None)
    return shardings


def shard_params(mesh: Mesh, params: dict) -> dict:
    """Place a backbone param pytree onto the mesh with TP shardings."""
    shardings = backbone_param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
