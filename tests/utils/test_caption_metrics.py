"""BLEU / ROUGE-L / METEOR captioning metrics (dependency-free; reference
computes these via nltk+rouge_score, runners/multitask_runner.py:1356-1503)."""

import pytest

from deepcoro_clip_tpu.utils.caption_metrics import (
    captioning_metrics,
    corpus_bleu,
    meteor,
    rouge_l,
)


def test_identity_scores_are_perfect():
    refs = ["70% lesion in the mid lad .", "the rca is normal ."]
    m = captioning_metrics(refs, refs)
    assert m["bleu1"] == pytest.approx(1.0)
    assert m["bleu4"] == pytest.approx(1.0)
    assert m["rouge_l"] == pytest.approx(1.0)
    # perfect match: one chunk spanning everything -> tiny penalty only
    assert m["meteor"] > 0.98


def test_disjoint_scores_are_zero():
    m = captioning_metrics(["aaa bbb"], ["ccc ddd"])
    assert m["bleu1"] == 0.0 and m["rouge_l"] == 0.0 and m["meteor"] == 0.0


def test_meteor_penalizes_fragmentation():
    ref = ["a b c d e f"]
    in_order = meteor(["a b c"], ref)       # one chunk
    scrambled = meteor(["c a b"], ref)      # same unigrams, more chunks
    assert in_order > scrambled > 0.0


def test_meteor_recall_weighted():
    # recall-heavy weighting: covering more of the reference scores higher
    # than a short precise candidate (alpha=0.9)
    ref = ["a b c d e f g h i j"]
    full = meteor(["a b c d e f g h i j"], ref)
    short = meteor(["a b"], ref)
    assert full > short


def test_bleu_brevity_penalty():
    ref = ["a b c d"]
    short = corpus_bleu(["a b"], ref)["bleu1"]
    assert short < 1.0  # penalized despite perfect precision


def test_rouge_subsequence():
    assert rouge_l(["a x b y c"], ["a b c"]) == pytest.approx(
        2 * (3 / 5) * (3 / 3) / ((3 / 5) + 1.0))


def test_empty_candidate_safe():
    m = captioning_metrics([""], ["a b"])
    assert m["meteor"] == 0.0 and m["bleu1"] == 0.0
