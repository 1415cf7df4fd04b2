"""Reference (torch) checkpoint -> flax parameter import.

The reference saves monolithic ``torch.save`` dicts keyed by component
(``video_encoder`` / ``text_encoder`` / ``linear_probing`` / ... — reference:
runners/video_constrative_learning_runner.py:1084-1093,
runners/linear_probing_runner.py:845-851). Every component EXCEPT the mVIT
video backbone is weight-isomorphic to this repo's modules, so a reference
user can carry over:

- the whole text tower (BERT backbone + projection head),
- the video projection head, attention pool, and EnhancedVideoAggregator,
- MIL / linear-probing heads (incl. gated attention and view embeddings).

The mVIT backbone itself has no mapping (this repo's video tower is CoroViT,
a deliberately different TPU-native architecture) — it is reported as
skipped, not silently dropped. See docs/MIGRATION.md §4.

All mapping functions take a ``{name: np.ndarray}`` state dict (call
``numpy_state_dict`` on a torch state_dict first); torch itself is only
needed by ``load_torch_checkpoint``. Correctness of every mapping is pinned
by the weight-transplant parity suite (tests/parity/) which runs the actual
reference modules against the transplanted flax modules.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

__all__ = [
    "numpy_state_dict",
    "load_torch_checkpoint",
    "save_converted",
    "load_converted",
    "linear_to_flax",
    "layernorm_to_flax",
    "mha_to_flax",
    "attention_pool_to_flax",
    "aggregator_to_flax",
    "mil_to_flax",
    "captioning_decoder_to_flax",
    "text_encoder_to_flax",
    "video_encoder_partial_to_flax",
    "convert_reference_checkpoint",
]


def numpy_state_dict(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """torch state_dict (tensors) -> plain numpy dict."""
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a reference checkpoint onto CPU (requires torch)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def save_converted(trees: Mapping[str, Any], path: str) -> None:
    """Serialize converted component trees (flax msgpack, target-free)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(dict(trees)))


def load_converted(path: str) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def _sub(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Strip ``prefix`` off matching keys."""
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def linear_to_flax(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """torch Linear ``[out, in]`` -> flax Dense ``[in, out]``."""
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def layernorm_to_flax(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def mha_to_flax(
    sd: Mapping[str, np.ndarray], prefix: str, fused: bool
) -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> this repo's ``layers.Attention``.

    ``fused=True`` targets the self-attention path (one ``qkv`` kernel);
    ``fused=False`` the cross-attention path (separate ``q``/``k``/``v``).
    torch packs ``in_proj_weight`` as ``[3D, D]`` row-blocks q|k|v.
    """
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd.get(f"{prefix}.in_proj_bias")
    proj = linear_to_flax(sd, f"{prefix}.out_proj")
    if fused:
        out: Dict[str, Any] = {
            "qkv": {"kernel": np.ascontiguousarray(w.T), "bias": b},
            "proj": proj,
        }
        if b is None:
            del out["qkv"]["bias"]
        return out
    wq, wk, wv = np.split(w, 3, axis=0)
    out = {
        "q": {"kernel": np.ascontiguousarray(wq.T)},
        "k": {"kernel": np.ascontiguousarray(wk.T)},
        "v": {"kernel": np.ascontiguousarray(wv.T)},
        "proj": proj,
    }
    if b is not None:
        bq, bk, bv = np.split(b, 3, axis=0)
        out["q"]["bias"], out["k"]["bias"], out["v"]["bias"] = bq, bk, bv
    return out


def attention_pool_to_flax(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``AttentionPool`` (models/attention_pool.py:10-101) ->
    ``models.attention_pool.AttentionPool`` params."""
    params = {
        "query": sd["query"],
        "attn": mha_to_flax(sd, "attn", fused=False),
        "norm": layernorm_to_flax(sd, "norm"),
    }
    if "proj.weight" in sd:  # output_dim != embed_dim (else nn.Identity)
        params["out_proj"] = linear_to_flax(sd, "proj")
    return params


def aggregator_to_flax(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``EnhancedVideoAggregator`` (models/video_aggregator.py:57-159)
    -> ``models.video_aggregator.EnhancedVideoAggregator`` params.

    The learned-query score here is scaled by 1/sqrt(D) (softmax-temperature
    convention) where the reference uses the bare dot product — the query is
    multiplied by sqrt(D), an exact reparameterization.
    """
    depth = 1 + max(
        (int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))),
        default=-1,
    )
    query = sd["attn_query"]
    d = query.shape[-1]
    params: Dict[str, Any] = {
        "pos_embedding": sd["pos_encoding"],
        "norm": layernorm_to_flax(sd, "final_ln"),
        "query": query[0, 0] * np.sqrt(float(d)),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": layernorm_to_flax(sd, f"{p}.norm1"),
            "norm2": layernorm_to_flax(sd, f"{p}.norm2"),
            "attn": mha_to_flax(sd, f"{p}.attn", fused=True),
            "mlp": {
                "fc1": linear_to_flax(sd, f"{p}.mlp.0"),
                "fc2": linear_to_flax(sd, f"{p}.mlp.3"),
            },
        }
    return params


def mil_to_flax(
    sd: Mapping[str, np.ndarray], gated_scope: str = "shared"
) -> Dict[str, Any]:
    """Reference ``MultiInstanceLinearProbing`` -> ``models.mil`` params.

    The reference shares ONE attention_V/U/w across both hierarchy levels
    (multi_instance_linear_probing.py:509-536); load with
    ``separate_video_attention=False`` (our ``shared`` scope) to match.
    """
    heads = sorted(
        {m.group(1) for k in sd if (m := re.match(r"heads\.([^.]+)\.weight$", k))}
    )
    params: Dict[str, Any] = {
        f"head_{h}": linear_to_flax(sd, f"heads.{h}") for h in heads
    }
    if "attention_V.weight" in sd:
        params[f"{gated_scope}_gated"] = {
            "V": linear_to_flax(sd, "attention_V"),
            "U": linear_to_flax(sd, "attention_U"),
            "w": linear_to_flax(sd, "attention_w"),
        }
    if "view_embedding.weight" in sd:
        params["view_embeddings"] = {"embedding": sd["view_embedding.weight"]}
    return params


def captioning_decoder_to_flax(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``CaptioningDecoder`` (models/captioning_decoder.py:11-335)
    -> ``models.captioning_decoder.CaptioningDecoder`` params.

    Two exact reparameterizations: the reference cross-attends to the video
    features directly (this repo's ``memory_proj`` is set to identity), and
    its ``lm_head`` has no bias (set to zeros here).
    """
    depth = 1 + max(
        (
            int(m.group(1))
            for k in sd
            if (m := re.match(r"decoder_layers\.(\d+)\.", k))
        ),
        default=-1,
    )
    d = sd["token_embeddings.weight"].shape[1]
    params: Dict[str, Any] = {
        "token_emb": {"embedding": sd["token_embeddings.weight"]},
        "pos_emb": sd["position_embeddings.weight"],
        "embed_norm": layernorm_to_flax(sd, "embedding_layer_norm"),
        "norm": layernorm_to_flax(sd, "final_layer_norm"),
        "lm_head": {
            "kernel": np.ascontiguousarray(sd["lm_head.weight"].T),
            "bias": np.zeros(sd["lm_head.weight"].shape[0], np.float32),
        },
        "memory_proj": {
            "kernel": np.eye(d, dtype=np.float32),
            "bias": np.zeros(d, np.float32),
        },
    }
    for i in range(depth):
        p = f"decoder_layers.{i}"
        params[f"layer{i}"] = {
            "norm1": layernorm_to_flax(sd, f"{p}.self_attention_layer_norm"),
            "self_attn": mha_to_flax(sd, f"{p}.self_attention", fused=True),
            "norm2": layernorm_to_flax(sd, f"{p}.cross_attention_layer_norm"),
            "cross_attn": mha_to_flax(sd, f"{p}.cross_attention", fused=False),
            "norm3": layernorm_to_flax(sd, f"{p}.feed_forward_layer_norm"),
            "mlp": {
                "fc1": linear_to_flax(sd, f"{p}.intermediate"),
                "fc2": linear_to_flax(sd, f"{p}.output"),
            },
        }
    return params


def text_encoder_to_flax(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``TextEncoder`` (bert + Dropout/Linear/GELU/Dropout proj,
    models/text_encoder.py:27-68) -> ``models.text_encoder.TextEncoder``."""
    from deepcoro_clip_tpu.utils.hf_import import bert_state_dict_to_flax

    depth = 1 + max(
        (
            int(m.group(1))
            for k in sd
            if (m := re.search(r"encoder\.layer\.(\d+)\.", k))
        ),
        default=-1,
    )
    params = bert_state_dict_to_flax(sd, depth=depth)
    if "proj.1.weight" in sd:
        params["proj"] = {"proj": linear_to_flax(sd, "proj.1")}
    return params


def video_encoder_partial_to_flax(
    sd: Mapping[str, np.ndarray],
) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Convert the convertible parts of a reference ``VideoEncoder`` state
    dict; returns ``(params, skipped)`` where ``skipped`` counts the tensors
    with no mapping (the mVIT backbone under ``model.``)."""
    params: Dict[str, Any] = {}
    if "proj.1.weight" in sd:
        params["proj"] = {"proj": linear_to_flax(sd, "proj.1")}
    agg = _sub(sd, "aggregator.")
    if agg:
        params["aggregator"] = aggregator_to_flax(agg)
    pool = _sub(sd, "attention_pool.")
    if pool and "query" in pool:  # AttentionPool (not the WithCLS variant)
        params["pool"] = attention_pool_to_flax(pool)
    skipped = {
        "model (mVIT backbone — no CoroViT mapping)": sum(
            1 for k in sd if k.startswith("model.")
        ),
        "attention_pool (WithCLS variant — documented divergence)": (
            0 if (not pool or "query" in pool) else len(pool)
        ),
    }
    return params, {k: v for k, v in skipped.items() if v}


def convert_reference_checkpoint(
    ckpt: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Full reference checkpoint dict -> ``(component param trees, report)``.

    Handles the component keys the reference runners save: ``text_encoder``,
    ``video_encoder`` (partial — mVIT skipped), ``linear_probing``,
    ``captioning_decoder``; scalar metadata (epoch / best metrics) passes
    through in the report.
    """
    trees: Dict[str, Any] = {}
    report: Dict[str, Any] = {"converted": [], "skipped": {}, "meta": {}}
    for key, val in ckpt.items():
        if not isinstance(val, Mapping) or not val:
            if isinstance(val, (int, float, str, bool)):
                report["meta"][key] = val
            continue
        try:
            sd = numpy_state_dict(val)
        except Exception:
            continue
        if key == "text_encoder":
            trees[key] = text_encoder_to_flax(sd)
            report["converted"].append(key)
        elif key == "video_encoder":
            tree, skipped = video_encoder_partial_to_flax(sd)
            if tree:
                trees[key] = tree
                report["converted"].append(f"{key} (partial)")
            report["skipped"].update(
                {f"{key}.{k}": v for k, v in skipped.items()}
            )
        elif key == "linear_probing":
            trees[key] = mil_to_flax(sd)
            report["converted"].append(key)
        elif key == "captioning_decoder":
            trees[key] = captioning_decoder_to_flax(sd)
            report["converted"].append(key)
        elif key in ("optimizer", "scheduler", "scaler"):
            report["skipped"][key] = len(sd)  # GPU-runtime state, not weights
        else:
            report["skipped"][f"{key} (no mapping)"] = len(sd)
    return trees, report
