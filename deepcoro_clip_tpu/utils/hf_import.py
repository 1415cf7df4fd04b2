"""Import HuggingFace BERT (PubMedBERT) torch weights into the flax TextEncoder.

The reference wraps HF PubMedBERT directly (reference: models/text_encoder.py:
27-137, pooler stripped). Our ``models/text_encoder.py`` replicates the exact
BERT-base post-LN architecture so a checkpoint maps 1:1:

HF name                                          -> flax param
embeddings.word_embeddings.weight                -> word_embeddings.embedding
embeddings.position_embeddings.weight            -> position_embeddings
embeddings.LayerNorm.{weight,bias}               -> embeddings_norm.{scale,bias}
encoder.layer.N.attention.self.query.*           -> layerN.attention.query.*
encoder.layer.N.attention.self.{key,value}.*     -> layerN.attention.{key,value}.*
encoder.layer.N.attention.output.dense.*         -> layerN.attention.out.*
encoder.layer.N.attention.output.LayerNorm.*     -> layerN.attention_norm.*
encoder.layer.N.intermediate.dense.*             -> layerN.intermediate.*
encoder.layer.N.output.dense.*                   -> layerN.output.*
encoder.layer.N.output.LayerNorm.*               -> layerN.output_norm.*

Dense kernels are transposed (torch [out,in] -> flax [in,out]). Token-type
embeddings are folded into the word embeddings' segment-0 row addition
(the reference never uses segment B), i.e. added to the position table row 0?
No: HF adds token_type_embeddings[0] to every position — we fold it into the
position embeddings. The pooler is dropped (reference strips it).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def bert_state_dict_to_flax(
    sd: Mapping[str, Any], depth: int = 12
) -> Dict[str, Any]:
    """torch state_dict (BertModel, optionally 'bert.'-prefixed) -> flax
    params for ``TextEncoder`` (everything except the projection head, which
    is new and keeps its init)."""

    def get(name):
        for prefix in ("", "bert."):
            key = prefix + name
            if key in sd:
                return _t(sd[key])
        raise KeyError(name)

    params: Dict[str, Any] = {}
    word = get("embeddings.word_embeddings.weight")
    pos = get("embeddings.position_embeddings.weight")
    try:
        tok_type = get("embeddings.token_type_embeddings.weight")[0]
        pos = pos + tok_type[None, :]  # segment 0 for every token
    except KeyError:
        pass
    params["word_embeddings"] = {"embedding": word}
    params["position_embeddings"] = pos
    params["embeddings_norm"] = {
        "scale": get("embeddings.LayerNorm.weight"),
        "bias": get("embeddings.LayerNorm.bias"),
    }

    def dense(name):
        return {
            "kernel": get(f"{name}.weight").T,
            "bias": get(f"{name}.bias"),
        }

    for i in range(depth):
        b = f"encoder.layer.{i}"
        params[f"layer{i}"] = {
            "attention": {
                "query": dense(f"{b}.attention.self.query"),
                "key": dense(f"{b}.attention.self.key"),
                "value": dense(f"{b}.attention.self.value"),
                "out": dense(f"{b}.attention.output.dense"),
            },
            "attention_norm": {
                "scale": get(f"{b}.attention.output.LayerNorm.weight"),
                "bias": get(f"{b}.attention.output.LayerNorm.bias"),
            },
            "intermediate": dense(f"{b}.intermediate.dense"),
            "output": dense(f"{b}.output.dense"),
            "output_norm": {
                "scale": get(f"{b}.output.LayerNorm.weight"),
                "bias": get(f"{b}.output.LayerNorm.bias"),
            },
        }
    return params


def load_pubmedbert_into(params: Dict[str, Any], checkpoint_path: str,
                         depth: int = 12) -> Dict[str, Any]:
    """Merge a local torch BERT checkpoint into existing TextEncoder params
    (keeps the projection head)."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    imported = bert_state_dict_to_flax(
        {k: v.numpy() for k, v in sd.items()}, depth=depth
    )
    merged = dict(params)
    merged.update(imported)
    return merged
