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

    def linear_shardings(p: dict, col_parallel: bool) -> dict:
        """Sharding for one linear leaf, full-precision ({"w"}) or int8
        weight-quantized ({"w_q", "w_s"} — backbone.quantize_linear_params).
        col_parallel: output-dim over 'tp' (q/k/v/gate/up); else input-dim
        (o/down) with per-output scales/biases replicated."""
        w_spec = ns(None, None, "tp") if col_parallel else ns(None, "tp", None)
        out = {}
        if "w_q" in p:
            out["w_q"] = w_spec
            out["w_s"] = ns(None, "tp") if col_parallel else ns(None)
        else:
            out["w"] = w_spec
        if "b" in p:
            out["b"] = ns(None, "tp") if col_parallel else ns(None)
        return out

    def attn_shardings(attn: dict) -> dict:
        out = {name: linear_shardings(attn[name], col_parallel=True)
               for name in ("q", "k", "v")}
        out["o"] = linear_shardings(attn["o"], col_parallel=False)
        if "q_norm" in attn:
            out["q_norm"] = ns(None)
            out["k_norm"] = ns(None)
        return out

    def mlp_shardings(mlp: dict) -> dict:
        return {
            "gate": linear_shardings(mlp["gate"], col_parallel=True),
            "up": linear_shardings(mlp["up"], col_parallel=True),
            "down": linear_shardings(mlp["down"], col_parallel=False),
        }

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
