"""Pretrained-weight download helpers (network-gated).

Reference counterparts: utils/huggingface_wrapper.py,
utils/download_pretrained_weights.py, utils/download_vasovision.py — HF
snapshot downloads with an API key. This environment is zero-egress, so
everything degrades to clear errors / local-cache lookups; on a connected
machine the same functions fetch for real.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


def download_pubmedbert(
    target_dir: str | Path = "pretrained/pubmedbert",
    repo_id: str = "microsoft/BiomedNLP-PubMedBERT-base-uncased-abstract-fulltext",
    token: Optional[str] = None,
    local_only: bool = False,
) -> Optional[Path]:
    """Snapshot-download PubMedBERT (tokenizer + torch weights). Returns the
    local path, or None when offline and not cached. Pair with
    ``utils/hf_import.load_pubmedbert_into`` to initialise the text tower."""
    try:
        from huggingface_hub import snapshot_download

        path = snapshot_download(
            repo_id, local_dir=str(target_dir), token=token,
            local_files_only=local_only,
        )
        return Path(path)
    except Exception as e:
        print(f"[download] PubMedBERT unavailable ({type(e).__name__}: {e}); "
              "the text tower will train from scratch (hash tokenizer).")
        return None


def load_local_torch_checkpoint(path: str | Path):
    """Load a local torch checkpoint state dict (cpu)."""
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return sd.state_dict() if hasattr(sd, "state_dict") else sd
