"""Coverage for multihost helpers (single-process identity), profiling, and
the fused scan-train-steps path used by bench.py."""

import jax
import numpy as np
import pytest

from deepcoro_clip_tpu.parallel.multihost import (
    broadcast_from_host0,
    gather_arrays,
    gather_objects,
)


def test_multihost_identity_single_process():
    assert gather_objects(["a", {"b": 1}]) == ["a", {"b": 1}]
    np.testing.assert_array_equal(gather_arrays(np.arange(4)), np.arange(4))
    assert broadcast_from_host0({"x": 1}) == {"x": 1}


def test_profiler_trace_smoke(tmp_path):
    from deepcoro_clip_tpu.utils.profiling import device_memory_stats, trace

    with trace(tmp_path):
        _ = jax.numpy.ones(8).sum().block_until_ready()
    assert any(tmp_path.iterdir())  # a trace directory was written
    stats = device_memory_stats()
    assert len(stats) == jax.local_device_count()


def test_scan_train_steps_matches_single_steps():
    """bench.py's fused K-step program must advance the state like K separate
    step calls (same batch, learnable temp)."""
    from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.train.clip import (
        build_clip_bundle,
        make_scan_train_steps,
        make_train_step,
    )
    import sys
    sys.path.insert(0, "tests")
    from runners.test_clip_train_step import synth_batch, tiny_config

    register_all()
    cfg = tiny_config(scheduler_name="cosine", dropout=0.0)
    mesh = make_mesh(MeshSpec(data=4, model=2))
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(0))
    batch = bundle.batch_sharding_fn(synth_batch(cfg))

    scan_fn = make_scan_train_steps(bundle, n_steps=3)
    s_scan, m = scan_fn(state, batch, jax.random.PRNGKey(7))
    assert int(np.asarray(s_scan.step)) == 3
    assert np.isfinite(float(m["loss"]))
