"""Scheduled sampling for caption training (two-pass parallel variant).

Off by default (program unchanged); when on, decoder inputs at t>0 are
pass-1 predictions with probability p (ramped), targets stay gold."""

import numpy as np
import pytest

import jax

from deepcoro_clip_tpu.data.tokenizer import HashTokenizer
from deepcoro_clip_tpu.registry import register_all

register_all()


def _cfg(**over):
    from deepcoro_clip_tpu.configs.multitask import MultitaskConfig

    d = dict(
        pipeline_project="DeepCORO_multitask", frames=4, resize=32,
        batch_size=4, multi_video=False, num_videos=1, vit_dim=32,
        vit_depth=1, vit_heads=1, vit_patch=[2, 16, 16], text_dim=32,
        text_depth=1, text_heads=2, text_vocab_size=512, max_text_length=16,
        embedding_dim=16, num_heads=2, aggregator_depth=1, dropout=0.0,
        decoder_dim=16, decoder_depth=1, decoder_heads=2,
        decoder_max_length=16, mvm_decoder_dim=16, mvm_decoder_depth=1,
        precision="fp32", use_pallas_attention=False, lr=1e-3,
    )
    d.update(over)
    return MultitaskConfig.from_dict(d)


def _batch(tok, B=4, L=16):
    texts = ["proximal lad with 80% stenosis.", "no significant disease.",
             "mid rca 70% lesion.", "left main is normal."][:B]
    r = np.random.default_rng(0)
    enc = tok(texts, max_length=L)
    return {
        "videos": r.integers(0, 255, (B, 1, 4, 32, 32, 3)).astype(np.uint8),
        "video_mask": np.ones((B, 1), bool),
        "input_ids": np.asarray(enc["input_ids"]),
        "attention_mask": np.asarray(enc["attention_mask"]),
        "caption_ids": np.asarray(enc["input_ids"]),
        "caption_mask": np.asarray(enc["attention_mask"]),
    }


def _run_one_step(cfg):
    from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
    from deepcoro_clip_tpu.train.multitask import (
        build_multitask_bundle, make_multitask_train_step,
    )

    mesh = make_mesh(MeshSpec(data=2, model=1))
    bundle, state = build_multitask_bundle(cfg, mesh, jax.random.PRNGKey(0))
    step = make_multitask_train_step(bundle)
    tok = HashTokenizer(vocab_size=512, max_length=16)
    db = bundle.batch_sharding_fn(_batch(tok))
    state, m = step(state, db, jax.random.PRNGKey(7), 1.0, 1.0, 1.0,
                    0.0, 0.0, -1.0)
    return {k: float(v) for k, v in m.items()}


def test_off_by_default_no_metric():
    m = _run_one_step(_cfg())
    assert "ss_prob" not in m
    assert np.isfinite(m["loss"])


def test_full_mixing_changes_caption_loss_only():
    m_off = _run_one_step(_cfg())
    m_on = _run_one_step(_cfg(scheduled_sampling_prob=1.0))
    assert m_on["ss_prob"] == pytest.approx(1.0)
    # same init/rng: contrastive and mvm paths untouched by the mix
    assert m_on["loss_contrastive"] == pytest.approx(
        m_off["loss_contrastive"], rel=1e-5)
    assert m_on["loss_mvm"] == pytest.approx(m_off["loss_mvm"], rel=1e-5)
    # captioning loss computed on self-predicted inputs differs (an
    # untrained decoder's argmax tokens are ~never the gold prefix)
    assert abs(m_on["loss_captioning"] - m_off["loss_captioning"]) > 1e-6
    assert np.isfinite(m_on["loss"])


def test_warmup_ramp_starts_at_teacher_forcing():
    # huge warmup -> ss_prob == 0 at step 0 -> mix keeps every gold token,
    # so the second pass reproduces the teacher-forced loss exactly
    m_off = _run_one_step(_cfg())
    m_ramp = _run_one_step(_cfg(scheduled_sampling_prob=0.5,
                                scheduled_sampling_warmup_steps=10_000))
    assert m_ramp["ss_prob"] == pytest.approx(0.0, abs=1e-6)
    assert m_ramp["loss_captioning"] == pytest.approx(
        m_off["loss_captioning"], rel=1e-5)


def test_trains_with_scheduled_sampling():
    from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
    from deepcoro_clip_tpu.train.multitask import (
        build_multitask_bundle, make_multitask_train_step,
    )

    cfg = _cfg(scheduled_sampling_prob=0.25)
    mesh = make_mesh(MeshSpec(data=2, model=1))
    bundle, state = build_multitask_bundle(cfg, mesh, jax.random.PRNGKey(0))
    step = make_multitask_train_step(bundle)
    tok = HashTokenizer(vocab_size=512, max_length=16)
    db = bundle.batch_sharding_fn(_batch(tok))
    losses = []
    for i in range(6):
        state, m = step(state, db, jax.random.PRNGKey(i), 1.0, 1.0, 1.0,
                        0.0, 0.0, -1.0)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
