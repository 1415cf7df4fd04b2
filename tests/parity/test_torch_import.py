"""End-to-end reference-checkpoint conversion (utils/torch_import.py).

Builds a real ``torch.save`` checkpoint in the reference's on-disk layout
(component-keyed state dicts, reference:
runners/video_constrative_learning_runner.py:1084-1093) from the ACTUAL
reference modules at small sizes, runs the converter CLI path
(convert -> msgpack -> load), applies the trees to this repo's flax
modules, and asserts the forwards agree.

Tolerances follow the per-module transplant tests: exact-ish (1e-5/2e-5)
where architectures match exactly, 5e-3 where the documented tanh-vs-erf
GELU flavor applies (docs/PARITY.md).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

D, HEADS, B, N, L = 64, 4, 3, 5, 7


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """A reference-layout checkpoint built from small real torch modules."""
    import importlib

    # text tower: bert.* + proj.{0..3} Sequential, the reference
    # TextEncoder's exact state_dict layout (models/text_encoder.py:52-68)
    cfg = transformers.BertConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=16, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    bert = transformers.BertModel(cfg).eval()
    text_proj = torch.nn.Linear(32, 16)
    text_sd = {f"bert.{k}": v for k, v in bert.state_dict().items()}
    text_sd["proj.1.weight"] = text_proj.weight.detach()
    text_sd["proj.1.bias"] = text_proj.bias.detach()

    return {
        "bert_cfg": cfg,
        "bert": bert,
        "text_proj": text_proj,
        "text_sd": text_sd,
    }


def _reference_modules(reference):
    import importlib

    agg_mod = importlib.import_module("models.video_aggregator")
    pool_mod = importlib.import_module("models.attention_pool")
    mil_mod = importlib.import_module("models.multi_instance_linear_probing")
    torch.manual_seed(1)
    agg = agg_mod.EnhancedVideoAggregator(
        embedding_dim=D, num_heads=HEADS, dropout=0.0, aggregator_depth=2,
        max_segments=64,
    ).eval()
    pool = pool_mod.AttentionPool(embed_dim=D, num_heads=HEADS, dropout=0.0).eval()
    mil = mil_mod.MultiInstanceLinearProbing(
        embedding_dim=D, head_structure={"stenosis": 3, "ifr": 1},
        pooling_mode="attention", attention_hidden=32, dropout=0.0,
    ).eval()
    vproj = torch.nn.Linear(D, D)
    return agg, pool, mil, vproj


def _video_sd(agg, pool, vproj):
    sd = {}
    sd.update({f"aggregator.{k}": v for k, v in agg.state_dict().items()})
    sd.update({f"attention_pool.{k}": v for k, v in pool.state_dict().items()})
    sd["proj.1.weight"] = vproj.weight.detach()
    sd["proj.1.bias"] = vproj.bias.detach()
    # un-convertible backbone mass the converter must skip, not crash on
    sd["model.blocks.0.attn.qkv.weight"] = torch.zeros(8, 8)
    return sd


def test_convert_roundtrip_and_forward_parity(reference, checkpoint, tmp_path):
    from deepcoro_clip_tpu.utils.torch_import import (
        convert_reference_checkpoint, load_converted, save_converted,
    )

    agg, pool, mil, vproj = _reference_modules(reference)
    ckpt = {
        "epoch": 7,
        "text_encoder": checkpoint["text_sd"],
        "video_encoder": _video_sd(agg, pool, vproj),
        "linear_probing": mil.state_dict(),
        "optimizer": {"state": torch.zeros(1)},
    }
    pt = tmp_path / "ref.pt"
    torch.save(ckpt, pt)

    loaded = torch.load(pt, map_location="cpu", weights_only=False)
    trees, report = convert_reference_checkpoint(loaded)
    assert set(trees) == {"text_encoder", "video_encoder", "linear_probing"}
    assert report["meta"]["epoch"] == 7
    assert any("mVIT" in k for k in report["skipped"])

    out = tmp_path / "conv.msgpack"
    save_converted(trees, str(out))
    trees = load_converted(str(out))

    r = np.random.default_rng(0)

    # --- text tower ------------------------------------------------------
    from deepcoro_clip_tpu.models.text_encoder import TextEncoder

    ids = r.integers(0, 96, (2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int64)
    te = TextEncoder(embedding_dim=16, vocab_size=96, dim=32, depth=2,
                     num_heads=2, mlp_dim=64, max_positions=16, dropout=0.0,
                     proj_dropout=0.0, dtype=jnp.float32, use_flash=False)
    init = te.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                   attention_mask=jnp.asarray(mask, jnp.int32))
    import flax.linen as fnn
    params = fnn.meta.unbox(init)["params"]
    params.update(trees["text_encoder"])
    got = np.asarray(te.apply({"params": params}, jnp.asarray(ids),
                              attention_mask=jnp.asarray(mask, jnp.int32)))
    with torch.no_grad():
        hidden = checkpoint["bert"](
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state[:, 0]
        want = torch.nn.functional.gelu(checkpoint["text_proj"](hidden)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-3)  # GELU flavor

    # --- video proj / aggregator / pool -----------------------------------
    from deepcoro_clip_tpu.models.attention_pool import AttentionPool
    from deepcoro_clip_tpu.models.video_aggregator import EnhancedVideoAggregator

    x = r.normal(size=(B, N, D)).astype(np.float32)
    fa = EnhancedVideoAggregator(dim=D, num_heads=HEADS, depth=2, dropout=0.0,
                                 max_segments=64, dtype=jnp.float32,
                                 use_flash=False)
    got = np.asarray(fa.apply({"params": trees["video_encoder"]["aggregator"]},
                              jnp.asarray(x), deterministic=True))
    with torch.no_grad():
        want = agg(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-3)

    toks = r.normal(size=(B, L, D)).astype(np.float32)
    fp = AttentionPool(dim=D, num_heads=HEADS, dropout=0.0,
                       dtype=jnp.float32, use_flash=False)
    got = np.asarray(fp.apply({"params": trees["video_encoder"]["pool"]},
                              jnp.asarray(toks), deterministic=True))
    with torch.no_grad():
        want = pool(torch.from_numpy(toks)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)

    # --- MIL probe ---------------------------------------------------------
    from deepcoro_clip_tpu.models.mil import MultiInstanceLinearProbing

    fm = MultiInstanceLinearProbing(
        embedding_dim=D, head_structure={"stenosis": 3, "ifr": 1},
        pooling_mode="attention", attention_hidden=32, dropout=0.0,
        dropout_attention=0.0, separate_video_attention=False,
        dtype=jnp.float32,
    )
    got = fm.apply({"params": trees["linear_probing"]}, jnp.asarray(x),
                   deterministic=True)
    with torch.no_grad():
        want = mil(torch.from_numpy(x))
    for h in ("stenosis", "ifr"):
        np.testing.assert_allclose(np.asarray(got[h]), want[h].numpy(),
                                   rtol=1e-5, atol=1e-5)


def test_converter_cli(reference, checkpoint, tmp_path, capsys):
    agg, pool, mil, vproj = _reference_modules(reference)
    pt = tmp_path / "ref.pt"
    torch.save({"text_encoder": checkpoint["text_sd"],
                "video_encoder": _video_sd(agg, pool, vproj)}, pt)
    import scripts.convert_torch_checkpoint as cli

    out = tmp_path / "conv.msgpack"
    rc = cli.main([str(pt), "--out", str(out),
                   "--report", str(tmp_path / "rep.json")])
    assert rc == 0 and out.exists()
    text = capsys.readouterr().out
    assert "text_encoder" in text and "skipped" in text
