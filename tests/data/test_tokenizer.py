import numpy as np
import pytest

from deepcoro_clip_tpu.data.tokenizer import CLS_ID, PAD_ID, SEP_ID, HashTokenizer


def test_shapes_and_specials():
    tok = HashTokenizer(vocab_size=30522, max_length=16)
    out = tok(["severe stenosis of the RCA", ""], max_length=16)
    assert out["input_ids"].shape == (2, 16)
    assert out["input_ids"][0, 0] == CLS_ID
    row = out["input_ids"][0]
    assert SEP_ID in row
    assert out["attention_mask"][0].sum() >= 3
    # empty text: CLS + SEP only
    assert out["attention_mask"][1].sum() == 2


def test_determinism_and_case_insensitivity():
    tok = HashTokenizer(vocab_size=30522)
    a = tok(["Left Main STENOSIS"])["input_ids"]
    b = tok(["left main stenosis"])["input_ids"]
    np.testing.assert_array_equal(a, b)


def test_ids_in_range_for_small_vocab():
    """Regression: small vocab used to produce negative ids -> NaN gathers on
    TPU (caught by the CLI drive on hardware)."""
    tok = HashTokenizer(vocab_size=512, max_length=16)
    out = tok(["rca stenosis severity 2 and some words"] * 3, max_length=16)
    ids = out["input_ids"]
    assert ids.min() >= 0
    assert ids.max() < 512


def test_truncation():
    tok = HashTokenizer(vocab_size=30522, max_length=8)
    out = tok(["a b c d e f g h i j k l m n"], max_length=8)
    assert out["input_ids"].shape == (1, 8)
    assert out["attention_mask"][0].sum() == 8


def test_too_small_vocab_raises():
    with pytest.raises(ValueError):
        HashTokenizer(vocab_size=50)
