"""WordPiece vocabulary trainer (VERDICT round-2 #2): likelihood-scored
merges over the runtime splitter, BERT id layout, shipped assets/vocab.txt."""

from pathlib import Path

import pytest

from deepcoro_clip_tpu.data.tokenizer import WordPieceTokenizer, get_tokenizer
from scripts.train_wordpiece import (
    emit_bert_layout,
    train_wordpiece,
    word_counts,
)

REPO = Path(__file__).resolve().parents[2]


def _vocab_from(texts, tmp_path, merges=50, vocab_size=1200):
    tokens = train_wordpiece(word_counts(texts), merges, min_freq=2)
    lines = emit_bert_layout(tokens, vocab_size)
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(lines) + "\n")
    return p


def test_layout_ids(tmp_path):
    p = _vocab_from(["the lad shows 80% stenosis."] * 4, tmp_path)
    tok = WordPieceTokenizer(str(p))
    assert (tok.pad_id, tok.unk_id, tok.cls_id, tok.sep_id) == (0, 100, 101, 102)
    assert tok.vocab["[MASK]"] == 103
    assert tok.vocab_size == 1200


def test_merges_learn_frequent_words(tmp_path):
    texts = ["proximal lad with 80% stenosis."] * 50
    p = _vocab_from(texts, tmp_path, merges=200)
    tok = WordPieceTokenizer(str(p))
    # every frequent word merges to a single piece
    assert tok.tokenize("stenosis") == ["stenosis"]
    assert tok.tokenize("proximal") == ["proximal"]


def test_novel_words_decompose_not_unk(tmp_path):
    p = _vocab_from(["the lad is normal."] * 4, tmp_path)
    tok = WordPieceTokenizer(str(p))
    for w in ("restenosis", "83", "cabg"):
        ids = tok.tokenize_ids(w)
        assert tok.unk_id not in ids, w
        assert tok.decode(ids).replace(" ", "") == w


def test_oversize_vocab_rejected(tmp_path):
    tokens = [f"tok{i}" for i in range(500)]
    with pytest.raises(SystemExit):
        emit_bert_layout(tokens, 1100)


def test_shipped_vocab_roundtrips_corpus_reports():
    """assets/vocab.txt is the committed artifact every quality number rides."""
    vocab = REPO / "assets" / "vocab.txt"
    assert vocab.exists(), "assets/vocab.txt must be committed"
    tok = WordPieceTokenizer(str(vocab))
    assert tok.vocab_size == 30522  # keeps the flagship embedding-table shape
    from deepcoro_clip_tpu.data.synthetic_angio import report_text, sample_findings

    for vid in range(40):
        text = report_text(sample_findings(vid, seed=0, max_findings=2), vid, 0)
        ids = tok.tokenize_ids(text)
        assert tok.unk_id not in ids
        assert tok.decode(ids).replace(" ", "") == text.replace(" ", "")


def test_get_tokenizer_uses_shipped_vocab_at_flagship_size():
    tok = get_tokenizer(vocab_size=30522, max_length=64)
    assert isinstance(tok, WordPieceTokenizer)


def test_get_tokenizer_falls_back_for_tiny_tables():
    tok = get_tokenizer(vocab_size=2048, max_length=16)
    assert not isinstance(tok, WordPieceTokenizer)
    out = tok(["mid rca 80% stenosis"])
    assert out["input_ids"].max() < 2048
