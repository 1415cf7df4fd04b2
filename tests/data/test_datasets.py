"""Dataset/collate/sampler tests (reference: tests/test_video_clip_dataset.py,
test_multi_video_dataset.py, test_stats_dataset.py)."""

import numpy as np
import pandas as pd
import pytest

from deepcoro_clip_tpu.data.collate import (
    collate_clip,
    collate_mil,
    collate_multi_positive,
)
from deepcoro_clip_tpu.data.datasets import StatsDataset, VideoClipDataset, VideoDataset
from deepcoro_clip_tpu.data.sampler import ClassAwareBatchSampler, ShardedBatchSampler
from deepcoro_clip_tpu.data.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    """8 clips in 3 studies, alpha-separated CSV (the reference's format)."""
    root = tmp_path_factory.mktemp("data")
    rows = []
    r = np.random.default_rng(0)
    for i in range(8):
        p = root / f"clip{i}.npy"
        np.save(p, r.integers(0, 255, size=(10, 24, 24, 3)).astype(np.uint8))
        study = f"S{i // 3}"
        rows.append(
            {
                "FileName": str(p),
                "Report": f"report for study {study}",
                "StudyInstanceUID": study,
                "Split": "train" if i < 6 else "val",
                "stenosis": float(i * 10),
                "view_id": i % 3,
            }
        )
    csv = root / "manifest.csv"
    pd.DataFrame(rows).to_csv(csv, sep="α", index=False)
    return str(csv)


def test_single_video_dataset(manifest):
    ds = VideoClipDataset(manifest, split="train", frames=4, resize=16)
    assert len(ds) == 6
    item = ds[0]
    assert item["videos"].shape == (1, 4, 16, 16, 3)
    assert item["video_mask"].tolist() == [True]
    assert "report" in item["text"]


def test_split_filtering(manifest):
    ds = VideoClipDataset(manifest, split="val", frames=4, resize=16)
    assert len(ds) == 2


def test_multi_video_grouping_and_padding(manifest):
    ds = VideoClipDataset(
        manifest, split="train", frames=4, resize=16,
        multi_video=True, num_videos=4,
    )
    # train split: studies S0 (3 clips), S1 (3 clips)
    assert len(ds) == 2
    item = ds[0]
    assert item["videos"].shape == (4, 4, 16, 16, 3)
    assert item["video_mask"].sum() == 3  # one padded slot
    assert np.all(item["videos"][3] == 0)


def test_missing_files_dropped(manifest, tmp_path):
    df = pd.read_csv(manifest, sep="α", engine="python")
    df.loc[0, "FileName"] = str(tmp_path / "nope.npy")
    p = tmp_path / "m2.csv"
    df.to_csv(p, sep="α", index=False)
    ds = VideoClipDataset(str(p), split="train", frames=4, resize=16)
    assert len(ds) == 5


def test_stats_dataset(manifest):
    ds = VideoClipDataset(manifest, split="train", frames=4, resize=16)
    mean, std = StatsDataset(ds, max_samples=4).compute()
    assert mean.shape == (3,)
    assert np.all(mean > 50) and np.all(mean < 200)
    assert np.all(std > 0)


def test_video_dataset_targets_and_views(manifest):
    ds = VideoDataset(
        manifest, split="train", frames=4, resize=16,
        multi_video=True, num_videos=3,
        target_labels=["stenosis"], view_column="view_id", num_view_classes=3,
    )
    item = ds[0]
    assert "stenosis" in item["targets"]
    assert item["view_ids"].shape == (3,)


def test_collate_clip(manifest):
    ds = VideoClipDataset(manifest, split="train", frames=4, resize=16)
    tok = HashTokenizer(vocab_size=1000, max_length=32)
    batch = collate_clip([ds[0], ds[1]], tok, max_text_length=32)
    assert batch["videos"].shape == (2, 1, 4, 16, 16, 3)
    assert batch["input_ids"].shape == (2, 32)
    assert batch["attention_mask"][0, 0] == 1


def test_collate_multi_positive_dedups_texts():
    tok = HashTokenizer(vocab_size=1000, max_length=16)
    items = [
        {"videos": np.zeros((1, 2, 4, 4, 3), np.float32),
         "video_mask": np.ones((1,), bool),
         "positives": [("severe stenosis", 3.0), ("normal rca", 1.0)]},
        {"videos": np.zeros((1, 2, 4, 4, 3), np.float32),
         "video_mask": np.ones((1,), bool),
         "positives": [("severe stenosis", 3.0)]},
    ]
    b = collate_multi_positive(items, tok, max_text_length=16, max_texts=8)
    assert b["input_ids"].shape == (8, 16)
    assert b["text_valid"].sum() == 2  # deduped
    assert b["positive_mask"][0].sum() == 2
    assert b["positive_mask"][1].sum() == 1
    # shared text has the same bank index for both videos
    j = np.argmax(b["positive_mask"][1])
    assert b["positive_mask"][0, j] == 1
    assert b["positive_weights"][0, j] == 3.0


def test_sharded_sampler_partitions_batches():
    s0 = ShardedBatchSampler(100, 10, seed=1, process_index=0, process_count=2)
    s1 = ShardedBatchSampler(100, 10, seed=1, process_index=1, process_count=2)
    b0, b1 = list(s0), list(s1)
    assert len(b0) == 5 and len(b1) == 5
    all_idx = np.concatenate(b0 + b1)
    assert len(np.unique(all_idx)) == 100  # exact partition


def test_sampler_epoch_reshuffles_deterministically():
    s = ShardedBatchSampler(50, 10, seed=1)
    a = np.concatenate(list(s))
    s.set_epoch(1)
    b = np.concatenate(list(s))
    assert not np.array_equal(a, b)
    s2 = ShardedBatchSampler(50, 10, seed=1)
    s2.set_epoch(1)
    np.testing.assert_array_equal(b, np.concatenate(list(s2)))


def test_class_aware_sampler_ratio():
    labels = [1] * 10 + [0] * 90
    s = ClassAwareBatchSampler(labels, batch_size=8, abnormal_ratio=0.5, seed=0)
    for batch in s:
        assert (np.asarray(batch) < 10).sum() == 4  # half abnormal


def test_loader_prefetch(manifest):
    from deepcoro_clip_tpu.data.loader import PrefetchLoader

    ds = VideoClipDataset(manifest, split="train", frames=4, resize=16)
    tok = HashTokenizer(vocab_size=1000, max_length=16)
    loader = PrefetchLoader(
        ds, ShardedBatchSampler(len(ds), 2, seed=0),
        lambda items: collate_clip(items, tok, 16), num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["videos"].shape[0] == 2


def test_view_ids_follow_shuffled_videos(tmp_path):
    """Regression: with shuffle_videos=True the view id of clip j must match
    the clip actually loaded into slot j (clips carry a recognizable
    per-view constant intensity)."""
    rows = []
    for v in range(4):
        p = tmp_path / f"v{v}.npy"
        np.save(p, np.full((4, 8, 8, 3), v * 60, np.uint8))
        rows.append({"FileName": str(p), "StudyInstanceUID": "S0",
                     "Split": "train", "stenosis": 1.0, "view_id": v})
    csv = tmp_path / "m.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    ds = VideoDataset(
        str(csv), split="train", frames=2, resize=8,
        multi_video=True, num_videos=2, shuffle_videos=True,
        target_labels=["stenosis"], view_column="view_id", num_view_classes=4,
        seed=0,
    )
    for epoch in range(4):
        ds.set_epoch(epoch)
        item = ds[0]
        for j in range(2):
            mean_intensity = float(item["videos"][j].mean())
            expected_view = int(round(mean_intensity / 60.0))
            assert item["view_ids"][j] == expected_view


def test_nan_report_becomes_empty_string(tmp_path):
    p = tmp_path / "c.npy"
    np.save(p, np.zeros((4, 8, 8, 3), np.uint8))
    pd.DataFrame([{"FileName": str(p), "StudyInstanceUID": "S0",
                   "Split": "train", "Report": np.nan}]).to_csv(
        tmp_path / "m.csv", index=False)
    ds = VideoClipDataset(str(tmp_path / "m.csv"), split="train",
                          frames=2, resize=8)
    assert ds[0]["text"] == ""


def test_getitem_thread_safety_determinism(manifest):
    """Parallel __getitem__ must give the same augmented items as serial
    (per-item generators; a shared RNG would race under the prefetch pool)."""
    from concurrent.futures import ThreadPoolExecutor

    def build():
        return VideoClipDataset(manifest, split="train", frames=4, resize=16,
                                rand_augment=True, seed=7)

    ds = build()
    serial = [ds[i]["videos"] for i in range(len(ds))]
    ds2 = build()
    with ThreadPoolExecutor(4) as pool:
        parallel = list(pool.map(lambda i: ds2[i]["videos"], range(len(ds2))))
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(a, b)


def test_text_length_bucketing(manifest):
    from deepcoro_clip_tpu.data.collate import pick_text_bucket

    tok = HashTokenizer(vocab_size=1000, max_length=64)
    short = ["a b c", "d e"]
    assert pick_text_bucket(short, tok, 64, [8, 16, 32]) == 8
    longer = ["w " * 20]
    assert pick_text_bucket(longer, tok, 64, [8, 16, 32]) == 32
    too_long = ["w " * 100]
    assert pick_text_bucket(too_long, tok, 64, [8, 16, 32]) == 64
    # no buckets configured -> reference behavior (always max)
    assert pick_text_bucket(short, tok, 64, []) == 64
    # collate honors the bucket
    items = [{"videos": np.zeros((1, 2, 4, 4, 3), np.float32),
              "video_mask": np.ones((1,), bool), "text": "a b c",
              "paths": ["x"], "study_id": "s"}]
    b = collate_clip(items, tok, max_text_length=64, length_buckets=[8, 16])
    assert b["input_ids"].shape == (1, 8)


def test_severity_bucket_sampler():
    from deepcoro_clip_tpu.data.sampler import SeverityBucketBatchSampler

    sev = ["normal"] * 50 + ["severe"] * 10 + ["cto"] * 4
    s = SeverityBucketBatchSampler(
        sev, batch_size=8,
        bucket_quotas={"normal": 0.5, "severe": 0.25, "cto": 0.25},
        seed=0, n_batches=6,
    )
    for batch in s:
        assert len(batch) == 8
        kinds = [sev[i] for i in batch]
        assert kinds.count("normal") >= 3
        assert kinds.count("cto") >= 1  # small bucket sampled w/ replacement
    # warmup phase shifts toward easy buckets
    s2 = SeverityBucketBatchSampler(
        sev, batch_size=8,
        bucket_quotas={"normal": 0.34, "severe": 0.33, "cto": 0.33},
        warmup_epochs=2, seed=0, n_batches=10,
    )
    s2.set_epoch(0)
    warm = np.concatenate(list(s2))
    s2.set_epoch(5)
    late = np.concatenate(list(s2))
    warm_normals = np.mean([sev[i] == "normal" for i in warm])
    late_normals = np.mean([sev[i] == "normal" for i in late])
    assert warm_normals > late_normals


def test_severity_sampler_quota_fidelity():
    """Review regression: round-off trim must not deterministically starve
    the last bucket; fill draws must be quota-weighted; case-insensitive
    quota keys; full mismatch raises."""
    from deepcoro_clip_tpu.data.sampler import SeverityBucketBatchSampler

    sev = ["normal"] * 40 + ["severe"] * 40 + ["cto"] * 40
    s = SeverityBucketBatchSampler(
        sev, batch_size=8,
        bucket_quotas={"Normal": 0.34, "SEVERE": 0.33, "cto": 0.33},
        seed=0, n_batches=200,
    )
    counts = {"normal": 0, "severe": 0, "cto": 0}
    n_batches = 0
    for epoch in range(3):
        s.set_epoch(epoch)
        for b in s:
            n_batches += 1
            for i in b:
                counts[sev[i]] += 1
    total = sum(counts.values())
    for k, frac in counts.items():
        assert abs(frac / total - 1 / 3) < 0.03, counts
    assert n_batches == 3 * len(s)

    with pytest.raises(ValueError):
        SeverityBucketBatchSampler(sev, 8, bucket_quotas={"bogus": 1.0})
