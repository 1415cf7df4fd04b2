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
    strict: bool = False,
) -> Optional[Path]:
    """Snapshot-download PubMedBERT (tokenizer + torch weights). Returns the
    local path, or None when the snapshot can't be obtained (best-effort
    mode). ``strict=True`` re-raises instead, surfacing fixable failures
    (bad token, full disk, typo'd repo id) rather than silently training from
    scratch. Pair with ``utils/hf_import.load_pubmedbert_into`` to
    initialise the text tower."""
    try:
        from huggingface_hub import snapshot_download

        path = snapshot_download(
            repo_id, local_dir=str(target_dir), token=token,
            local_files_only=local_only,
        )
        return Path(path)
    except Exception as e:
        if strict:
            raise
        print(f"[download] PubMedBERT unavailable ({type(e).__name__}: {e}); "
              "the text tower will train from scratch (hash tokenizer). "
              "Pass strict=True to surface the underlying error.")
        return None
