"""End-to-end contrastive train step on the 8-device CPU mesh (data=4, model=2):
the minimum end-to-end slice of SURVEY.md §7 step 4, with real dp+tp sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepcoro_clip_tpu.configs import ClipConfig
from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
from deepcoro_clip_tpu.registry import register_all
from deepcoro_clip_tpu.train.clip import (
    build_clip_bundle,
    make_eval_step,
    make_train_step,
)

register_all()


def tiny_config(**kw):
    d = dict(
        frames=4, resize=32, batch_size=8, num_videos=2, multi_video=True,
        vit_dim=64, vit_depth=2, vit_heads=2, vit_patch=[2, 16, 16],
        text_dim=32, text_depth=2, text_heads=2, text_vocab_size=64,
        max_text_length=16, embedding_dim=32, num_heads=2, aggregator_depth=1,
        dropout=0.0, lr=1e-3, precision="fp32", use_pallas_attention=False,
        scheduler_name="cosine_with_warmup", epochs=2,
    )
    d.update(kw)
    return ClipConfig.from_dict(d)


def synth_batch(cfg, seed=0, B=8):
    r = np.random.default_rng(seed)
    N = cfg.num_videos
    return {
        "videos": r.normal(size=(B, N, cfg.frames, cfg.resize, cfg.resize, 3))
        .astype(np.float32),
        "video_mask": np.ones((B, N), bool),
        "input_ids": r.integers(0, cfg.text_vocab_size,
                                size=(B, cfg.max_text_length)).astype(np.int32),
        "attention_mask": np.ones((B, cfg.max_text_length), np.int32),
    }


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshSpec(data=4, model=2))


def test_clip_train_step_runs_and_learns(mesh):
    cfg = tiny_config()
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0),
                                      steps_per_epoch=4)
    step_fn = make_train_step(bundle)
    batch = bundle.batch_sharding_fn(synth_batch(cfg))
    losses = []
    for i in range(5):
        state, metrics = step_fn(
            state, batch, jax.random.PRNGKey(i), 0.0, 0.0, -1.0
        )
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch 5x must overfit
    assert int(state.step) == 5


def test_ratio_zero_trains_the_backbone(mesh):
    """Config-default freeze ratio 0.0 must mean NO freezing: backbone
    blocks and patch embed get real gradient flow (regression for the
    round-2 bug where ratio 0.0 froze the entire tower and flagship
    training silently learned projections over random features)."""
    cfg = tiny_config()
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    step_fn = make_train_step(bundle)
    batch = bundle.batch_sharding_fn(synth_batch(cfg))
    before = jax.tree_util.tree_map(np.asarray, state.params["video_encoder"])
    # two steps: cosine_with_warmup has lr == 0 at step 0
    state2, m = step_fn(state, batch, jax.random.PRNGKey(0), 0.0, 0.0, -1.0)
    state2, m = step_fn(state2, batch, jax.random.PRNGKey(1), 0.0, 0.0, -1.0)
    after = jax.tree_util.tree_map(np.asarray, state2.params["video_encoder"])
    for sub in ("patch_embed", "block0", "norm"):
        db = jax.tree_util.tree_leaves(before["backbone"][sub])
        da = jax.tree_util.tree_leaves(after["backbone"][sub])
        moved = sum(float(np.abs(b - a).max()) for b, a in zip(db, da))
        assert moved > 0.0, f"backbone/{sub} did not train at ratio 0.0"
    assert float(m["grad_norm_video_encoder"]) > 0.0


def test_tensor_parallel_params_are_sharded(mesh):
    cfg = tiny_config()
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    k = state.params["video_encoder"]["backbone"]["block0"]["mlp"]["fc1"]["kernel"]
    specs = {s for s in (k.sharding.spec,)}
    assert any("model" in str(s) for s in specs), k.sharding


def test_freeze_ratio_pins_parameters(mesh):
    cfg = tiny_config()
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    step_fn = make_train_step(bundle)
    batch = bundle.batch_sharding_fn(synth_batch(cfg))

    before = jax.tree_util.tree_map(np.asarray, state.params["video_encoder"])
    state2, _ = step_fn(state, batch, jax.random.PRNGKey(0), 1.0, 1.0, -1.0)
    after = jax.tree_util.tree_map(np.asarray, state2.params["video_encoder"])
    # full freeze: every video-encoder param unchanged
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(b, a)


def test_temp_override_pins_temperature(mesh):
    cfg = tiny_config()
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    step_fn = make_train_step(bundle)
    batch = bundle.batch_sharding_fn(synth_batch(cfg))
    lt0 = float(state.params["log_temp"])
    state2, m = step_fn(state, batch, jax.random.PRNGKey(0), 0.0, 0.0, 0.5)
    assert float(m["temperature"]) == pytest.approx(0.5, rel=1e-5)
    assert float(state2.params["log_temp"]) == pytest.approx(lt0, abs=1e-9)


def test_siglip_multipositive_step(mesh):
    cfg = tiny_config(loss_name="siglip_pairwise",
                      siglip_max_positive_per_video=2)
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    step_fn = make_train_step(bundle)
    B, M = 8, 16
    r = np.random.default_rng(0)
    batch = synth_batch(cfg)
    batch["input_ids"] = r.integers(0, 64, size=(M, cfg.max_text_length)).astype(np.int32)
    batch["attention_mask"] = np.ones((M, cfg.max_text_length), np.int32)
    batch["positive_mask"] = (r.random((B, M)) > 0.8).astype(np.float32)
    batch["positive_weights"] = np.ones((B, M), np.float32)
    batch["text_valid"] = np.ones((M,), np.float32)
    sb = bundle.batch_sharding_fn(batch)
    state, metrics = step_fn(state, sb, jax.random.PRNGKey(0), 0.0, 0.0, -1.0)
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_deterministic(mesh):
    cfg = tiny_config(dropout=0.2)
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    eval_fn = make_eval_step(bundle)
    batch = bundle.batch_sharding_fn(synth_batch(cfg))
    o1 = eval_fn(state.params, batch)
    o2 = eval_fn(state.params, batch)
    np.testing.assert_array_equal(np.asarray(o1["video_emb"]),
                                  np.asarray(o2["video_emb"]))


def test_gradient_accumulation(mesh):
    """MultiSteps: params only change every k micro-batches (reference
    grad-accum, runners/video_constrative_learning_runner.py:1223)."""
    # cosine (no warmup): lr > 0 at the very first optimizer step
    cfg = tiny_config(gradient_accumulation_steps=2, scheduler_name="cosine")
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    step_fn = make_train_step(bundle)
    batch = bundle.batch_sharding_fn(synth_batch(cfg))
    p0 = np.asarray(
        jax.tree_util.tree_leaves(state.params["video_encoder"])[0])
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0), 0.0, 0.0, -1.0)
    p1 = np.asarray(
        jax.tree_util.tree_leaves(state.params["video_encoder"])[0])
    np.testing.assert_array_equal(p0, p1)  # first micro-batch: no update yet
    state, _ = step_fn(state, batch, jax.random.PRNGKey(1), 0.0, 0.0, -1.0)
    p2 = np.asarray(
        jax.tree_util.tree_leaves(state.params["video_encoder"])[0])
    assert not np.array_equal(p1, p2)  # second micro-batch applies the update


def test_alignment_score_modes():
    """Paired mode: masked diagonal mean. Multi-positive mode: positive-set
    cosine mean, padded rows excluded (round-3 review finding: the bank's
    row order has no per-video correspondence, so the diagonal is noise)."""
    import numpy as np
    import jax.numpy as jnp
    from deepcoro_clip_tpu.train.clip import alignment_score

    r = np.random.default_rng(0)
    v = jnp.asarray(r.normal(size=(4, 8)).astype(np.float32))
    t = jnp.asarray(r.normal(size=(6, 8)).astype(np.float32))

    # paired: diag of the first min(B,M) rows
    vn = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    tn = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    want = float(jnp.mean(jnp.sum(vn * tn[:4], axis=-1)))
    assert abs(float(alignment_score(v, t)) - want) < 1e-6

    # paired + sample_mask: padded rows drop out
    sm = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    want_m = float(jnp.mean(jnp.sum(vn[:3] * tn[:3], axis=-1)))
    assert abs(float(alignment_score(v, t, sample_mask=sm)) - want_m) < 1e-6

    # multi-positive: mean over the positive set only
    pos = jnp.zeros((4, 6)).at[0, 2].set(1.0).at[1, 5].set(1.0)
    sims = vn @ tn.T
    want_p = float((sims[0, 2] + sims[1, 5]) / 2.0)
    got = float(alignment_score(v, t, positive_mask=pos))
    assert abs(got - want_p) < 1e-6

    # multi-positive + sample_mask: row 1 padded -> only (0, 2) counts
    got2 = float(alignment_score(
        v, t, positive_mask=pos, sample_mask=jnp.asarray([1.0, 0.0, 1.0, 1.0])
    ))
    assert abs(got2 - float(sims[0, 2])) < 1e-6


def test_nonfinite_loss_applies_no_update(mesh):
    """A step whose loss is non-finite must leave params and opt state
    exactly unchanged (train/optim.zero_tree_if_nonfinite, round-4 ADVICE
    fix): the runner's delayed NaN detection then snapshots a state whose
    params saw only finite updates. Poisoning log_temp with NaN makes the
    loss NaN (embeddings themselves are nan-scrubbed in compute_loss)."""
    cfg = tiny_config()
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    step_fn = make_train_step(bundle)
    batch = bundle.batch_sharding_fn(synth_batch(cfg))
    # warm one normal step so Adam moments are non-trivial
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0), 0.0, 0.0, -1.0)

    poisoned = dict(state.params)
    poisoned["log_temp"] = jnp.full_like(state.params["log_temp"], jnp.nan)
    state = state.replace(params=poisoned)
    before_p = jax.tree_util.tree_map(np.asarray, dict(state.params))
    before_o = jax.tree_util.tree_map(np.asarray, state.opt_state)
    step_before = int(state.step)

    state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1),
                              0.0, 0.0, -1.0)
    assert not np.isfinite(float(metrics["loss"]))
    after_p = jax.tree_util.tree_map(np.asarray, dict(state2.params))
    after_o = jax.tree_util.tree_map(np.asarray, state2.opt_state)
    for b, a in zip(jax.tree_util.tree_leaves(before_p),
                    jax.tree_util.tree_leaves(after_p)):
        np.testing.assert_array_equal(b, a)
    for b, a in zip(jax.tree_util.tree_leaves(before_o),
                    jax.tree_util.tree_leaves(after_o)):
        if np.issubdtype(np.asarray(b).dtype, np.integer):
            continue  # step counters may advance; only moments must hold
        np.testing.assert_array_equal(b, a)
    assert int(state2.step) == step_before + 1

# trainer-loop / e2e compile tests: minutes each on the 1-core CPU
# harness — excluded from the fast default path (pass --runslow)
pytestmark = pytest.mark.slow
