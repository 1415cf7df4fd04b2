"""WordPieceTokenizer vs HF BertTokenizer on the shipped assets/vocab.txt.

Every measured quality artifact rides this tokenizer (QUALITY.md, CAPTIONS.md),
so its ids must be exactly what transformers' reference WordPiece produces on
the same vocab — same greedy longest-match-first subwords, same special-token
framing, same truncation/padding (reference tokenizer contract:
models/text_encoder.py:8-23).

Scope note: HF's BasicTokenizer keeps alphanumeric runs together
("ab12" is one word) while this build splits letter/digit runs before
WordPiece — irrelevant for the report language (digits are standalone
tokens) and asserted only on domain-shaped text here.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from deepcoro_clip_tpu.data.tokenizer import WordPieceTokenizer

VOCAB = Path(__file__).resolve().parents[2] / "assets" / "vocab.txt"

TEXTS = [
    "the left main shows 32 % narrowing .",
    "chronic total occlusion of the proximal rca .",
    "77 % lesion in the proximal circumflex . chronic total occlusion "
    "of the proximal rca .",
    "The First Diagonal IS Totally Occluded.",     # case folding
    "pseudoaneurysm of the ramus intermedius",      # unseen words → subwords/UNK
    "no angiographically significant stenosis",
    "ffr 0 . 72 in the mid lad ; ivus confirms",    # punctuation split
    "",                                             # empty report
]


@pytest.fixture(scope="module")
def hf():
    from transformers import BertTokenizer

    return BertTokenizer(vocab_file=str(VOCAB), do_lower_case=True)


@pytest.fixture(scope="module")
def ours():
    return WordPieceTokenizer(str(VOCAB), max_length=64)


@pytest.mark.skipif(not VOCAB.exists(), reason="no shipped vocab")
def test_ids_and_mask_match_hf(hf, ours):
    ref = hf(TEXTS, max_length=64, padding="max_length", truncation=True,
             return_tensors="np")
    got = ours(TEXTS, max_length=64)
    np.testing.assert_array_equal(got["input_ids"],
                                  ref["input_ids"].astype(np.int32))
    np.testing.assert_array_equal(got["attention_mask"],
                                  ref["attention_mask"].astype(np.int32))


@pytest.mark.skipif(not VOCAB.exists(), reason="no shipped vocab")
def test_truncation_matches_hf(hf, ours):
    long = " ".join(["the proximal lad shows 94 % narrowing ."] * 40)
    ref = hf([long], max_length=32, padding="max_length", truncation=True,
             return_tensors="np")
    got = ours([long], max_length=32)
    np.testing.assert_array_equal(got["input_ids"],
                                  ref["input_ids"].astype(np.int32))
    assert got["input_ids"][0, -1] == ours.sep_id  # SEP survives truncation


@pytest.mark.skipif(not VOCAB.exists(), reason="no shipped vocab")
def test_decode_roundtrip_matches_hf(hf, ours):
    for text in TEXTS[:3]:
        ids = ours([text], max_length=64)["input_ids"][0]
        body = [int(i) for i in ids if i not in
                (ours.pad_id, ours.cls_id, ours.sep_id)]
        # clean_up_tokenization_spaces is HF's cosmetic punctuation
        # re-attachment; the corpus reference text keeps tokens spaced
        assert ours.decode(body) == hf.decode(
            body, clean_up_tokenization_spaces=False)
