"""Retrieval-quality regression on the fixed synthetic corpus (round-1
VERDICT next-step #2): the tiny CLIP recipe must learn unseen-video
retrieval well above chance. Recalibrated on CPU after the freeze-mask
fix (backbone now trains at ratio 0.0): R@1 ~0.34, R@5 ~0.92,
MedianRank 2 over ~36 unique texts (chance R@1 ~0.03); thresholds
leave a >2x margin. ~2-3 min on the CPU backend."""

import pytest
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "dev"))


def test_synthetic_corpus_retrieval_above_chance():
    from synth_calibrate import run

    res = run(n_train=128, n_val=64, epochs=40, seed=0)
    assert res["n_unique_texts"] >= 20
    chance = 1.0 / res["n_unique_texts"]
    assert res["R@1"] >= max(0.15, 4 * chance), res
    assert res["R@5"] >= 0.6, res
    assert res["median_rank"] <= 5, res

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
