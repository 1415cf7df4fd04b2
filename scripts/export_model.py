"""Export / run frozen serving artifacts (jax.export StableHLO programs).

The reference's deployment story rebuilds the Python model from source +
torch checkpoint inside Docker (scripts/external_validation.py:710-960);
here the compiled retrieval program itself is the deployable: one
`jax.export`-serialized directory that `deepcoro_clip_tpu.serving`
(or scripts/serve.py --artifact) replays with only jax + numpy.

Usage:
  # freeze a trained tower + text bank into an artifact directory
  python scripts/export_model.py export --out art/ \
      [--base_config cfg.yaml | --tiny] \
      [--checkpoint ckpts/ --ckpt_name best_model_epoch_16] \
      [--text_bank bank.npz] [--max_batch 4 --num_videos 10 --top_k 5]

  # freeze a linear-probing pipeline (the external-validation model)
  python scripts/export_model.py export-probe --out art/ \
      --base_config config/linear_probing/stenosis_config.yaml \
      [--checkpoint ckpts/] [--max_batch 4]

  # serve a study from the artifact (no model code on this path;
  # dispatches on the artifact's kind: retrieval top-k or head predictions)
  python scripts/export_model.py run --artifact art/ --videos a.npy b.npy

  # numerically verify the artifact against an in-process forward
  python scripts/export_model.py verify --artifact art/ \
      [--base_config cfg.yaml | --tiny] [--checkpoint ... --ckpt_name ...]

``bank.npz`` comes from scripts/generate_embeddings.py (fields
``text_embeddings`` [M,D] + ``texts`` [M]); without it a random demo bank
is frozen (wire/latency smoke only).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _build_cfg(args):
    from deepcoro_clip_tpu.registry import register_all

    register_all()
    if args.tiny:
        from deepcoro_clip_tpu.flagship import tiny_config

        cfg = tiny_config(multi_video=True, num_videos=args.num_videos)
    elif args.base_config:
        from deepcoro_clip_tpu.configs.parser import parse_config

        cfg = parse_config(["--base_config", args.base_config])
        cfg.multi_video = True
        cfg.num_videos = args.num_videos
    else:
        from deepcoro_clip_tpu.flagship import flagship_config

        cfg = flagship_config(multi_video=True, num_videos=args.num_videos)
    return cfg


def _load_video_params(args, cfg):
    """Video-tower subtree of a CLIP checkpoint (scripts/serve.py:316-330)."""
    if not args.checkpoint:
        return None
    import jax

    from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
    from deepcoro_clip_tpu.train.checkpoint import CheckpointManager
    from deepcoro_clip_tpu.train.clip import build_clip_bundle

    mesh = make_mesh(MeshSpec(data=jax.device_count(), model=1))
    _, state = build_clip_bundle(
        cfg, mesh, jax.random.PRNGKey(0), steps_per_epoch=1)
    state = CheckpointManager(args.checkpoint).restore(state, args.ckpt_name)
    return state.params["video_encoder"]


def _load_bank(args, cfg):
    if args.text_bank:
        bank = np.load(args.text_bank, allow_pickle=True)
        return bank["text_embeddings"], [str(t) for t in bank["texts"]]
    r = np.random.default_rng(0)
    return (r.normal(size=(args.demo_bank, cfg.embedding_dim)),
            [f"demo report {i}" for i in range(args.demo_bank)])


def _print_artifact(out_dir, meta) -> None:
    sizes = {p.name: p.stat().st_size for p in sorted(Path(out_dir).iterdir())}
    print(json.dumps({"meta": meta, "bytes": sizes}, indent=1))


def cmd_export(args) -> None:
    from deepcoro_clip_tpu.serving import export_retrieval_artifact

    cfg = _build_cfg(args)
    bank_emb, bank_texts = _load_bank(args, cfg)
    meta = export_retrieval_artifact(
        cfg, args.out, bank_emb, bank_texts,
        max_batch=args.max_batch, top_k=args.top_k,
        video_params=_load_video_params(args, cfg),
    )
    _print_artifact(args.out, meta)


def cmd_export_probe(args) -> None:
    """Freeze a linear-probing pipeline (the external-validation model)."""
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.serving import export_probing_artifact

    register_all()
    from deepcoro_clip_tpu.configs.parser import parse_config

    cfg = parse_config(["--base_config", args.base_config])

    probe_params = None
    if args.checkpoint:
        import jax

        from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
        from deepcoro_clip_tpu.train.checkpoint import CheckpointManager
        from deepcoro_clip_tpu.train.linear_probe import build_probe_bundle

        mesh = make_mesh(MeshSpec(data=jax.device_count(), model=1))
        _, state = build_probe_bundle(
            cfg, mesh, jax.random.PRNGKey(0), steps_per_epoch=1)
        state = CheckpointManager(args.checkpoint).restore(
            state, args.ckpt_name)
        probe_params = state.params

    meta = export_probing_artifact(
        cfg, args.out, max_batch=args.max_batch, probe_params=probe_params,
    )
    _print_artifact(args.out, meta)


def _load_artifact(path):
    """Open either artifact kind by its meta."""
    from deepcoro_clip_tpu.serving import (
        META_FILE,
        ProbingArtifact,
        RetrievalArtifact,
    )

    kind = json.loads((Path(path) / META_FILE).read_text()).get("kind")
    cls = {"retrieval": RetrievalArtifact, "probing": ProbingArtifact}[kind]
    return cls(path)


def cmd_run(args) -> None:
    art = _load_artifact(args.artifact)
    m = art.meta
    if args.videos:
        study, mask = art.load_study(args.videos)
    else:  # smoke: random study at the compiled shape
        r = np.random.default_rng(0)
        study = r.integers(
            0, 256,
            (m["num_videos"], m["tokens_per_clip"], m["patch_bytes"]),
            dtype=np.uint8,
        )
        mask = np.ones((m["num_videos"],), bool)
    t0 = time.perf_counter()
    if m["kind"] == "retrieval":
        _, scores, idx = art.infer_batch(study[None], mask[None])
        body = {"topk": [
            {"text": art.bank_texts[int(j)], "score": float(s)}
            for j, s in zip(idx[0], scores[0])]}
    else:
        probs = art.predict(study[None], mask[None])
        body = {"predictions": {h: np.asarray(v)[0].tolist()
                                for h, v in probs.items()}}
    body["latency_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
    print(json.dumps(body, indent=1))


def cmd_verify(args) -> None:
    """Artifact output == in-process model output on a shared random study."""
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.serving import _probing_fn, _retrieval_fn
    from deepcoro_clip_tpu.models.video_encoder import video_encoder_from_config

    art = _load_artifact(args.artifact)
    m = art.meta

    r = np.random.default_rng(1)
    studies = r.integers(
        0, 256,
        (m["max_batch"], m["num_videos"], m["tokens_per_clip"],
         m["patch_bytes"]),
        dtype=np.uint8,
    )
    mask = np.ones((m["max_batch"], m["num_videos"]), bool)

    if m["kind"] == "retrieval":
        cfg = _build_cfg(args)
        model = video_encoder_from_config(cfg)
        emb_a, sc_a, idx_a = art.infer_batch(studies, mask)
        fn = jax.jit(_retrieval_fn(model, m["top_k"]))
        emb_b, sc_b, idx_b = fn(art._params, art._bank,
                                jnp.asarray(studies), jnp.asarray(mask))
        demb = float(np.max(np.abs(emb_a - np.asarray(emb_b))))
        dsc = float(np.max(np.abs(sc_a - np.asarray(sc_b))))
        ok = (demb < 1e-5 and dsc < 1e-5
              and np.array_equal(idx_a, np.asarray(idx_b)))
        print(json.dumps({"ok": bool(ok), "max_abs_emb": demb,
                          "max_abs_score": dsc}))
    else:
        from deepcoro_clip_tpu.registry import register_all

        register_all()
        from deepcoro_clip_tpu.configs.parser import parse_config
        from deepcoro_clip_tpu.train.linear_probe import _mil_from_config

        cfg = parse_config(["--base_config", args.base_config])
        video_model = video_encoder_from_config(
            cfg, aggregate=False,
            per_video=not m["hierarchical_tokens"],
        )
        fn = jax.jit(_probing_fn(
            video_model, _mil_from_config(cfg),
            m["hierarchical_tokens"], m["has_view_ids"],
        ))
        fn_args = [art._params, jnp.asarray(studies), jnp.asarray(mask)]
        art_args = [studies, mask]
        if m["has_view_ids"]:
            vid = np.zeros((m["max_batch"], m["num_videos"]), np.int32)
            fn_args.append(jnp.asarray(vid))
            art_args.append(vid)
        out_a = art.infer_batch(*art_args)
        out_b = fn(*fn_args)
        dmax = max(
            float(np.max(np.abs(out_a[h] - np.asarray(out_b[h]))))
            for h in out_a
        )
        ok = dmax < 1e-5
        print(json.dumps({"ok": bool(ok), "max_abs_logit": dmax,
                          "heads": sorted(out_a)}))
    if not ok:
        raise SystemExit(1)


def main(argv: Optional[list] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--base_config", default=None)
        p.add_argument("--tiny", action="store_true")
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--ckpt_name", default="checkpoint")
        p.add_argument("--num_videos", type=int, default=10)

    pe = sub.add_parser("export")
    common(pe)
    pe.add_argument("--out", required=True)
    pe.add_argument("--text_bank", default=None)
    pe.add_argument("--demo_bank", type=int, default=1000)
    pe.add_argument("--max_batch", type=int, default=4)
    pe.add_argument("--top_k", type=int, default=5)

    pp = sub.add_parser("export-probe")
    pp.add_argument("--base_config", required=True,
                    help="linear-probing pipeline YAML")
    pp.add_argument("--checkpoint", default=None)
    pp.add_argument("--ckpt_name", default="checkpoint")
    pp.add_argument("--out", required=True)
    pp.add_argument("--max_batch", type=int, default=4)

    pr = sub.add_parser("run")
    pr.add_argument("--artifact", required=True)
    pr.add_argument("--videos", nargs="*", default=None)

    pv = sub.add_parser("verify")
    common(pv)
    pv.add_argument("--artifact", required=True)

    args = ap.parse_args(argv)
    {"export": cmd_export, "export-probe": cmd_export_probe,
     "run": cmd_run, "verify": cmd_verify}[args.cmd](args)


if __name__ == "__main__":
    main()
