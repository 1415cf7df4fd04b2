"""Tokenization for medical report text.

The reference uses the HuggingFace PubMedBERT tokenizer (max_length 1024,
right padding/truncation — reference: models/text_encoder.py:8-23). This
build is zero-egress: ``get_tokenizer`` returns the HF tokenizer when its
files are available locally, else a deterministic hash word-piece fallback
with the same call contract (ids < 30522, CLS/SEP/PAD id layout of BERT
uncased vocabularies).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np

PAD_ID = 0
UNK_ID = 100
CLS_ID = 101
SEP_ID = 102
_FIRST_FREE = 999  # ids below this are reserved (BERT [unusedN] + specials)


class HashTokenizer:
    """Deterministic, vocabulary-free tokenizer.

    Lowercases, splits words/numbers/punctuation, maps each token to a stable
    hash bucket in [_FIRST_FREE, vocab_size). Collisions are acceptable for a
    from-scratch-trained text tower; the interface (and id layout for
    PAD/UNK/CLS/SEP) matches BERT so a real WordPiece vocab can drop in.
    """

    def __init__(self, vocab_size: int = 30522, max_length: int = 512):
        if vocab_size <= SEP_ID + 2:
            raise ValueError(f"vocab_size {vocab_size} too small (need > {SEP_ID + 2})")
        self.vocab_size = vocab_size
        self.model_max_length = max_length
        # small test vocabularies: shrink the reserved-id region so hash
        # buckets stay in range
        self.first_free = _FIRST_FREE if vocab_size > 2 * _FIRST_FREE else SEP_ID + 1
        self._splitter = re.compile(r"[a-z]+|\d+|[^\sa-z\d]")

    def _token_id(self, tok: str) -> int:
        h = 2166136261
        for ch in tok.encode():
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        return self.first_free + h % (self.vocab_size - self.first_free)

    def tokenize_ids(self, text: str) -> List[int]:
        toks = self._splitter.findall(str(text).lower())
        return [self._token_id(t) for t in toks]

    def __call__(
        self,
        texts: Sequence[str] | str,
        max_length: Optional[int] = None,
        padding: str = "max_length",
        truncation: bool = True,
        return_tensors: str = "np",
    ) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        max_length = max_length or self.model_max_length
        ids = np.full((len(texts), max_length), PAD_ID, np.int32)
        mask = np.zeros((len(texts), max_length), np.int32)
        for i, text in enumerate(texts):
            body = self.tokenize_ids(text)[: max_length - 2]
            seq = [CLS_ID] + body + [SEP_ID]
            ids[i, : len(seq)] = seq
            mask[i, : len(seq)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def get_tokenizer(
    name: str = "microsoft/BiomedNLP-PubMedBERT-base-uncased-abstract-fulltext",
    vocab_size: int = 30522,
    max_length: int = 512,
):
    """HF tokenizer if cached locally, else the hash fallback."""
    try:  # pragma: no cover - depends on local HF cache
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(name, local_files_only=True)
        tok.model_max_length = max_length
        return tok
    except Exception:
        return HashTokenizer(vocab_size=vocab_size, max_length=max_length)
