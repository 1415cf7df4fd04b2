"""Flagship-scale retrieval-quality run on the real TPU (VERDICT round-1 #2).

Stages (each resumable; run all by default):
  corpus  — generate the 224x16 synthetic corpus (~7k clips, ~17 GB, cached)
  train   — train the flagship recipe through the REAL runner (checkpoints,
            per-epoch retrieval validation, artifacts)
  tiers   — difficulty-split evaluation: R@k on 1-finding vs 2-finding
            validation subsets using the trained checkpoint
  scaling — lr x batch probes (300 steps each) documenting where the
            uniform-logits ln(B) plateau appears and that the shipped recipe
            escapes it
  report  — write QUALITY.md from the collected JSON artifacts

Usage: python dev/quality_run.py [stage ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
# Self-sufficient imports without touching PYTHONPATH: overriding PYTHONPATH
# here would shadow /root/.axon_site's sitecustomize, which registers the
# axon TPU PJRT plugin at interpreter start (JAX_PLATFORMS=axon would then
# fail with "unknown backend").
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
CORPUS = REPO / ".synth_corpus"
CORPUS_3F = REPO / ".synth_corpus_3f"  # val-only OOD tier: exactly 3 findings

N_TRAIN, N_VAL = 6000, 1024
CORPUS_SEED = 0   # the corpus is shared across training seeds
SEED = int(os.environ.get("DEEPCORO_QR_SEED", "0"))   # init + data order
BATCH = 16
TEXT_LEN = 128  # synthetic reports are short; honest-throughput bench keeps 512
EPOCHS = int(os.environ.get("DEEPCORO_QR_EPOCHS", "25"))
# text-tower geometry knob: 12 (the published artifact's PubMedBERT shape,
# default — quality seeds stay architecture-comparable across rounds) or 6
# (the flagship 6xDh=128 bench geometry; a run here checks the flip is
# quality-neutral, not just faster)
TEXT_HEADS = int(os.environ.get("DEEPCORO_QR_TEXT_HEADS", "12"))
# Grayscale H2D wire (config.mono_wire): the synthetic corpus is grayscale-
# replicated uint8 (verified channel-identical), so the mono wire is EXACT
# here and ships 1/3 the H2D bytes through the ~45 MB/s axon relay — the
# dominant step cost of quality runs in this environment. Default OFF:
# published seeds ran the RGB wire and chunked runs must keep one program;
# checkpoints are wire-interchangeable (the param tree is identical), so a
# mono run's artifacts remain comparable.
MONO = os.environ.get("DEEPCORO_QR_MONO", "0") == "1"
# Study mode (DEEPCORO_QR_STUDY=1): multi-view study retrieval — north-star
# config #2 (reference config/clip/base_config_x3d_m_multivideo.yaml). The
# corpus stage groups the SAME rendered clips into 2-4-video studies with
# one union-of-findings report (synthetic_angio.write_study_manifest); the
# train stage runs the multi-video recipe (aggregator over per-video
# embeddings) and retrieval is scored at STUDY level.
STUDY = os.environ.get("DEEPCORO_QR_STUDY", "0") == "1"
# From-scratch recipe knobs (VERDICT r4 #4: find the schedule that escapes
# the study-mode ln(B) plateau WITHOUT a warm start). Changing either bakes
# different schedule constants into the train step => fresh ~35 min remote
# compile; run dirs are suffixed so recipe variants never collide with the
# published seeds' artifacts.
QR_LR = float(os.environ.get("DEEPCORO_QR_LR", "1e-4"))
QR_WARMUP = os.environ.get("DEEPCORO_QR_WARMUP")  # num_warmup_percent

# Pin the quality-recipe PROGRAM regardless of the library's throughput
# defaults: every published quality seed ran the standard attention kernel
# (packed=0) with e^x softmax (exp2=0), and chunked runs resumed across
# sessions MUST keep one compiled program end-to-end. A later session
# flipping a perf default (as packed-attn was in round 3) would otherwise
# silently change the program mid-run. Callers can still override.
os.environ.setdefault("DEEPCORO_PACKED_ATTN", "0")
os.environ.setdefault("DEEPCORO_EXP2_SOFTMAX", "0")
# The round-4 non-finite-loss update guard changes the train-step program;
# quality seeds stay on the published seeds' exact program (the guard is
# purely defensive — no published seed ever hit a non-finite loss).
os.environ.setdefault("DEEPCORO_NANGUARD", "0")

# v2 run dirs are per-seed; round-2's 10-epoch .quality_run is kept as-is
RUN_DIR = REPO / (f".quality_run_v2_s{SEED}"
                  + ("" if TEXT_HEADS == 12 else f"_h{TEXT_HEADS}")
                  + ("_mono" if MONO else "")
                  + ("_study" if STUDY else "")
                  + ("" if QR_LR == 1e-4 else f"_lr{QR_LR:g}")
                  + (f"_wu{QR_WARMUP}" if QR_WARMUP else ""))
ART = RUN_DIR / "artifacts"


def stage_corpus():
    from deepcoro_clip_tpu.data.synthetic_angio import generate_corpus

    t0 = time.perf_counter()
    manifest = generate_corpus(
        CORPUS, n_train=N_TRAIN, n_val=N_VAL, size=224, frames=16,
        seed=CORPUS_SEED, max_findings=2, paraphrase=True, coarse_pct=True,
    )
    if STUDY:
        from deepcoro_clip_tpu.data.synthetic_angio import write_study_manifest

        manifest = write_study_manifest(CORPUS, CORPUS_SEED, 2, True)
    print(f"corpus ready: {manifest} ({time.perf_counter() - t0:.0f}s)")
    return manifest


def _base_cfg(**over):
    cfg = dict(
        pipeline_project="DeepCORO_clip",
        run_mode="train",
        data_filename=str(CORPUS / ("study_data.csv" if STUDY else "data.csv")),
        output_dir=str(RUN_DIR / "outputs"),
        epochs=EPOCHS,
        batch_size=BATCH,
        frames=16,
        resize=224,
        stride=1,
        num_workers=2,
        multi_video=STUDY,
        **({"num_videos": 4, "groupby_column": "StudyInstanceUID",
            "shuffle_videos": True} if STUDY else {}),
        max_text_length=TEXT_LEN,
        lr=QR_LR,
        **({"num_warmup_percent": float(QR_WARMUP)} if QR_WARMUP else {}),
        scheduler_name="cosine_with_warmup",
        loss_name="contrastive",
        use_wandb=False,
        recall_k=[1, 5, 10],
        ndcg_k=[5],
        early_stopping_patience=5,
        seed=SEED,
        log_layer_grad_norms=True,  # freeze-bug class diagnostics
        mono_wire=MONO,
    )
    cfg.update(over)
    return cfg


def _write_train_config():
    import yaml

    from deepcoro_clip_tpu.flagship import flagship_config

    fc = flagship_config()
    over = _base_cfg(
        vit_dim=fc.vit_dim, vit_depth=fc.vit_depth, vit_heads=fc.vit_heads,
        vit_patch=list(fc.vit_patch), vit_pool_stages=list(fc.vit_pool_stages),
        use_cls_token=fc.use_cls_token, embedding_dim=fc.embedding_dim,
        num_heads=fc.num_heads, aggregator_depth=fc.aggregator_depth,
        dropout=fc.dropout, text_dim=fc.text_dim, text_depth=fc.text_depth,
        # pinned: the published QUALITY.md artifact (and the frozen
        # config/quality recipe) trained the reference PubMedBERT geometry;
        # the flagship bench default moved to 6xDh=128 afterwards — quality
        # seeds must stay architecture-comparable across rounds
        text_heads=TEXT_HEADS, text_vocab_size=fc.text_vocab_size,
        temperature=fc.temperature, optimizer=fc.optimizer,
        precision=fc.precision, use_pallas_attention=fc.use_pallas_attention,
    )
    # DEEPCORO_QR_REUSE_STATS=<checkpoint.json>: reuse another run's
    # resolved dataset stats (exact when both runs read the same corpus on
    # the same wire — e.g. the study-mode run over the s2 clips), skipping
    # the fresh-run 6000-clip stats scan on this 1-core host (~15 min).
    reuse = os.environ.get("DEEPCORO_QR_REUSE_STATS")
    if reuse and Path(reuse).exists():
        meta = json.loads(Path(reuse).read_text())
        if meta.get("dataset_mean"):
            over["dataset_mean"] = meta["dataset_mean"]
            over["dataset_std"] = meta["dataset_std"]
    # DEEPCORO_QR_INIT_FROM=<checkpoint dir>: params-only warm start (e.g.
    # study-mode adaptation from a single-video backbone — from-scratch
    # study mode at short schedules pins at the ln(B) plateau, measured
    # r4; see QUALITY.md study-mode section)
    init_from = os.environ.get("DEEPCORO_QR_INIT_FROM")
    if init_from:
        over["init_from_checkpoint"] = init_from
    cfg_path = RUN_DIR / "train_config.yaml"
    RUN_DIR.mkdir(parents=True, exist_ok=True)
    yaml.safe_dump(over, cfg_path.open("w"))
    return cfg_path, over


def _existing_run_dir():
    outs = sorted((RUN_DIR / "outputs").rglob("config.yaml"))
    return outs[-1].parent if outs else None


def _last_epoch(run_out) -> int:
    meta_path = run_out / "checkpoints" / "checkpoint.json"
    if meta_path.exists():
        return int(json.loads(meta_path.read_text()).get("epoch", -1))
    return -1


def stage_train_chunk(start: int, end: int):
    """One bounded training slice in THIS process (resume -> train -> exit).

    The axon PJRT client leaks every H2D transfer buffer on the host
    (~bytes-transferred; measured 46 MB/step at flagship batch 16, OOM at
    ~2800 steps), so long runs must be chunked across processes."""
    import yaml

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import RunnerRegistry, register_all
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    register_all()
    cfg_path = RUN_DIR / "train_config.yaml"
    config = parse_config(["--base_config", str(cfg_path)])
    run_out = _existing_run_dir()
    if run_out is None:
        from deepcoro_clip_tpu.utils.files import generate_output_dir_name

        run_out = Path(generate_output_dir_name(config))
        run_out.mkdir(parents=True, exist_ok=True)
        (run_out / "config.yaml").write_text(cfg_path.read_text())
    else:
        config.resume_training = True
        meta = run_out / "checkpoints" / "checkpoint.json"
        if meta.exists():
            m = json.loads(meta.read_text())
            config.dataset_mean = m.get("dataset_mean")
            config.dataset_std = m.get("dataset_std")
    runner = RunnerRegistry.get(config.pipeline_project)(
        config, output_dir=str(run_out)
    )
    s = max(start, runner.maybe_resume())
    print(f"chunk: epochs [{s}, {end})", flush=True)
    runner.train(s, end)


def _metrics_age(run_out) -> float:
    """Seconds since the run last wrote a metrics line (inf if none)."""
    mj = run_out / "metrics.jsonl" if run_out else None
    if not mj or not mj.exists():
        return float("inf")
    try:
        last = mj.read_text().splitlines()[-1]
        return time.time() - json.loads(last)["ts"]
    except Exception:
        return float("inf")


def _run_chunk_watched(cmd, run_out, stall_s: int = 900,
                       timeout_s: int = 5400):
    """Run a chunk subprocess, killing it if the run's metrics stop
    advancing for ``stall_s`` (the relay dead-connection mode hangs
    dispatches mid-step or mid-checkpoint-save with the process
    futex-waiting at ~0 CPU — observed r4 tiers and r5 s2-completion;
    a killed chunk resumes from the last epoch checkpoint)."""
    import subprocess

    proc = subprocess.Popen(cmd, cwd=str(REPO))
    t0 = time.time()
    baseline_age = _metrics_age(run_out)
    if baseline_age == float("inf"):
        # brand-new run: the first chunk may legitimately sit in a fresh
        # remote compile for ~35 min before any metric flows
        stall_s = max(stall_s, 3600)
    while True:
        try:
            return proc.wait(timeout=60)
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > timeout_s:
            proc.kill()
            return "timeout"
        age = _metrics_age(run_out)
        # during startup (restore/compile) no metrics flow: give the
        # chunk `stall_s` from ITS OWN start before the age rule applies
        if waited > stall_s and age > stall_s and age > baseline_age - 1:
            print(f"chunk stalled (metrics age {age:.0f}s) — killing",
                  flush=True)
            proc.kill()
            return "stall"
        if age < stall_s:
            baseline_age = 0.0  # metrics flowed at least once


def stage_train():
    """Chunked flagship training: subprocess per CHUNK epochs (leak bound),
    then assemble the full history from the run dir's metrics.jsonl."""
    ART.mkdir(parents=True, exist_ok=True)
    _write_train_config()
    CHUNK = 2
    t0 = time.perf_counter()
    no_progress = 0
    while True:
        run_out = _existing_run_dir()
        done = _last_epoch(run_out) if run_out else -1
        start = done + 1
        if start >= EPOCHS:
            break
        # Bound each chunk: when the axon relay dies, device dispatches
        # HANG forever rather than erroring (CLAUDE.md) — the watcher
        # kills a chunk whose metrics stop advancing, and resume retries
        # it from the last epoch checkpoint.
        rc = _run_chunk_watched(
            [sys.executable, str(Path(__file__).resolve()),
             f"train_chunk:{start}:{min(start + CHUNK, EPOCHS)}"],
            run_out)
        if rc != 0:
            new_done = _last_epoch(_existing_run_dir())
            if new_done <= done:
                no_progress += 1
                # one free retry: a chunk can wedge at STARTUP (dead
                # relay connection before its first step — observed r5);
                # a second consecutive no-progress failure is real
                if no_progress > 1:
                    raise RuntimeError(
                        f"train chunk failed (rc={rc}) at epoch {start}")
                print(f"chunk made no progress (rc={rc}); retrying once",
                      flush=True)
                continue
            no_progress = 0
            print(f"chunk exited rc={rc}; progressed to "
                  f"epoch {new_done}, continuing", flush=True)
        else:
            no_progress = 0

    # rebuild the per-epoch history from the run's metrics.jsonl
    run_out = _existing_run_dir()
    hist: dict = {}
    for line in (run_out / "metrics.jsonl").read_text().splitlines():
        d = json.loads(line)
        step = d.get("step")
        if any(k.startswith("train/") for k in d) and "train/loss" in d:
            hist.setdefault(step, {})["loss"] = d["train/loss"]
            if "train/epoch_seconds" in d:
                hist[step]["epoch_seconds"] = d["train/epoch_seconds"]
        if "val/loss" in d:
            e = hist.setdefault(step, {})
            for k, v in d.items():
                if k.startswith("val/"):
                    e["val_" + k[4:]] = v
    history = [hist[e] | {"epoch": e} for e in sorted(hist) if "loss" in hist[e]]

    from deepcoro_clip_tpu.data.tokenizer import get_tokenizer

    tok_name = type(get_tokenizer(max_length=TEXT_LEN)).__name__
    out = {
        "history": history,
        "wall_seconds": round(time.perf_counter() - t0, 1),
        "config": {"epochs": EPOCHS, "batch_size": BATCH, "lr": QR_LR,
                   **({"num_warmup_percent": float(QR_WARMUP)}
                      if QR_WARMUP else {}),
                   "max_text_length": TEXT_LEN, "loss_name": "contrastive",
                   "seed": SEED, "tokenizer": tok_name},
        "note": "wall_seconds covers the resumed chunks of this invocation",
    }
    (ART / "train.json").write_text(json.dumps(out, default=float))
    print("train done:", history[-1] if history else "no history")


def _corpus_3f():
    """Val-only OOD tier corpus: fresh seed, up to 3 findings per video,
    filtered to EXACTLY 3 — harder compositions than anything in training."""
    import pandas as pd

    from deepcoro_clip_tpu.data.synthetic_angio import (
        generate_corpus, sample_findings,
    )

    manifest = CORPUS_3F / "data.csv"
    tier_csv = CORPUS_3F / "val_3findings.csv"
    if tier_csv.exists():
        return tier_csv
    generate_corpus(CORPUS_3F, n_train=0, n_val=768, size=224, frames=16,
                    seed=7, max_findings=3, paraphrase=True, coarse_pct=True)
    df = pd.read_csv(manifest, sep="α", engine="python")
    ids = df.StudyInstanceUID.str.replace("SYN", "").astype(int)
    keep = [len(sample_findings(i, 7, 3, True)) == 3 for i in ids]
    df[keep].to_csv(tier_csv, sep="α", index=False)
    return tier_csv


TIER_NAMES = ("1-finding", "2-findings", "3-findings-ood")


def stage_tier_one(tier: str):
    """Evaluate ONE difficulty tier in this process and write its partial
    result to ``ART/tier_<tier>.json``. Split out from stage_tiers so the
    orchestrator can bound each tier's chip window: a dead relay connection
    makes dispatches HANG (not error) — observed r4: the monolithic stage
    futex-waited 20 min at tier 2 and tiers.json was never written."""
    import pandas as pd
    import yaml

    from deepcoro_clip_tpu.data.synthetic_angio import sample_findings
    from deepcoro_clip_tpu.registry import RunnerRegistry, register_all
    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    register_all()

    if tier == "3-findings-ood":
        sub = pd.read_csv(_corpus_3f(), sep="α", engine="python")
    else:
        df = pd.read_csv(CORPUS / "data.csv", sep="α", engine="python")
        val = df[df.Split == "val"].copy()
        ids = val.StudyInstanceUID.str.replace("SYN", "").astype(int)
        nf = [len(sample_findings(i, CORPUS_SEED, 2, True)) for i in ids]
        want = 1 if tier == "1-finding" else 2
        sub = val[[n == want for n in nf]]

    tier_csv = RUN_DIR / f"val_{tier}.csv"
    sub.to_csv(tier_csv, sep="α", index=False)
    cfg_path = RUN_DIR / "train_config.yaml"
    over = yaml.safe_load(cfg_path.open())
    # resolved stats travel via the checkpoint meta (the chunked trainer
    # copies the RAW config into the run dir, so the backup may lack
    # them; val mode requires precomputed dataset_mean/std)
    backups = sorted((RUN_DIR / "outputs").rglob("config.yaml"))
    run_out = backups[-1].parent  # the actual training run directory
    meta = json.loads(
        (run_out / "checkpoints" / "checkpoint.json").read_text())
    resolved = yaml.safe_load(backups[-1].open())
    over.update(
        dataset_mean=meta.get("dataset_mean",
                              resolved.get("dataset_mean")),
        dataset_std=meta.get("dataset_std", resolved.get("dataset_std")),
    )
    over.update(run_mode="val", data_filename=str(tier_csv),
                output_dir=str(run_out))
    tier_cfg = RUN_DIR / f"cfg_{tier}.yaml"
    yaml.safe_dump(over, tier_cfg.open("w"))
    config = parse_config(["--base_config", str(tier_cfg)])
    runner = RunnerRegistry.get(config.pipeline_project)(
        config, output_dir=str(run_out))
    assert runner.restore_best(), "no checkpoint found for tier eval"
    metrics = runner.validate(epoch=999, split="val")
    out = {k: float(v) for k, v in metrics.items()}
    ART.mkdir(parents=True, exist_ok=True)
    (ART / f"tier_{tier}.json").write_text(json.dumps(out))
    print(tier, out, flush=True)


def stage_tiers(timeout_s: int = 2400, retries: int = 2):
    """R@k split by difficulty: 1/2-finding val videos + the 3-findings
    out-of-distribution corpus (unseen composition count).

    Each tier runs in a TIMEOUT-BOUNDED subprocess with kill+retry
    (VERDICT r4 #7): the axon relay's dead-connection mode hangs dispatches
    forever, so a stalled tier is killed and retried in a fresh process
    (fresh relay connection) instead of eating the session. Per-tier
    partials persist across invocations; tiers.json assembles whatever has
    completed."""
    if STUDY:
        print("tiers are defined per-clip; skipped in study mode")
        return
    import subprocess

    ART.mkdir(parents=True, exist_ok=True)
    for tier in TIER_NAMES:
        part = ART / f"tier_{tier}.json"
        if part.exists():
            print(f"{tier}: already measured, skipping", flush=True)
            continue
        for attempt in range(retries + 1):
            try:
                r = subprocess.run(
                    [sys.executable, str(Path(__file__).resolve()),
                     f"tier_one:{tier}"],
                    cwd=str(REPO), timeout=timeout_s,
                )
                rc = r.returncode
            except subprocess.TimeoutExpired:
                rc = "timeout (relay stall?)"
            if part.exists():
                break
            print(f"{tier}: attempt {attempt} failed (rc={rc})", flush=True)
    results = {t: json.loads((ART / f"tier_{t}.json").read_text())
               for t in TIER_NAMES if (ART / f"tier_{t}.json").exists()}
    (ART / "tiers.json").write_text(json.dumps(results))
    missing = [t for t in TIER_NAMES if t not in results]
    if missing:
        print(f"tiers INCOMPLETE, missing {missing}", flush=True)


def stage_scaling():
    """Orchestrate probe subprocesses (the axon client's H2D leak is
    bytes-proportional; each probe leaks ~12-45 GB).

    Two families:
    - ``scaling_recipe:<lr>``: the SHIPPED train step (make_train_step —
      warmup schedule, grad clipping, per-group lrs, dropout) at base lr;
      the 1e-4 program is already compiled by the training run.
    - ``scaling_probe:<B>``: bare AdamW at constant lr, no clipping, no
      warmup, uniform lr — the guardrail ablation.
    """
    import subprocess

    for stage in ("scaling_recipe:0.0001", "scaling_recipe:0.001",
                  "scaling_probe:16", "scaling_probe:32"):
        r = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), stage],
            cwd=str(REPO),
        )
        if r.returncode != 0:
            print(f"{stage} failed rc={r.returncode}", flush=True)


def stage_scaling_recipe(lr: float):
    """300 steps of the SHIPPED flagship recipe (the real jitted train step:
    cosine_with_warmup over the full horizon, max_grad_norm clip, text tower
    at text_lr, dropout) on repeated real batches, recording the trajectory
    vs the ln(B) plateau."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.data.collate import collate_clip
    from deepcoro_clip_tpu.data.datasets import VideoClipDataset
    from deepcoro_clip_tpu.data.tokenizer import get_tokenizer
    from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.train.clip import build_clip_bundle, make_train_step
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    register_all()
    cfg_path = RUN_DIR / "train_config.yaml"
    if not cfg_path.exists():
        _write_train_config()
    # identical shipped config except the base lr; same steps_per_epoch so
    # the schedule (and at lr=1e-4 the compiled program) matches training
    config = parse_config(["--base_config", str(cfg_path), "--lr", str(lr)])
    run_out = _existing_run_dir()
    if run_out is not None:
        m = json.loads((run_out / "checkpoints" / "checkpoint.json").read_text())
        config.dataset_mean = m.get("dataset_mean")
        config.dataset_std = m.get("dataset_std")

    B = config.batch_size
    ds = VideoClipDataset(
        str(CORPUS / "data.csv"), split="train", frames=16, resize=224,
        wire_dtype="uint8", target_label="Report",
    )
    tok = get_tokenizer(vocab_size=config.text_vocab_size,
                        max_length=TEXT_LEN)
    mesh = make_mesh(MeshSpec(data=1, model=1))
    bundle, state = build_clip_bundle(
        config, mesh, jax.random.PRNGKey(config.seed),
        steps_per_epoch=len(ds) // B,
    )
    step_fn = make_train_step(bundle)
    batches = []
    for i in range(8):
        items = [ds[j] for j in range(i * B, (i + 1) * B)]
        b = collate_clip(items, tok, max_text_length=TEXT_LEN)
        batches.append(bundle.batch_sharding_fn(
            {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
        ))
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(300):
        rng, sub = jax.random.split(rng)
        state, mtr = step_fn(state, batches[i % 8], sub, 0.0, 0.0, -1.0)
        if i % 10 == 0 or i == 299:
            losses.append(round(float(mtr["loss"]), 4))
    plateau = float(np.log(B))
    results = (json.loads((ART / "scaling.json").read_text())
               if (ART / "scaling.json").exists() else {})
    ART.mkdir(parents=True, exist_ok=True)
    key = f"recipe_B{B}_lr{lr:g}"
    results[key] = {
        "losses_every10": losses,
        "ln_B": round(plateau, 4),
        "final": losses[-1],
        "escaped_plateau": losses[-1] < 0.8 * plateau,
    }
    print(key, "final", losses[-1], "ln(B)", round(plateau, 3),
          "escaped:", results[key]["escaped_plateau"], flush=True)
    (ART / "scaling.json").write_text(json.dumps(results))


def stage_scaling_probe(only_B: int):
    """lr x batch probes: fixed 300 steps on repeated real corpus batches;
    record the loss trajectory vs the ln(B) plateau.  lr is a RUNTIME
    hyperparameter (optax.inject_hyperparams) so all lrs at one batch size
    share one compiled program — recompiles through the tunnel cost ~30 min
    each at flagship scale."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deepcoro_clip_tpu.data.collate import collate_clip
    from deepcoro_clip_tpu.data.datasets import VideoClipDataset
    from deepcoro_clip_tpu.data.tokenizer import get_tokenizer
    from deepcoro_clip_tpu.flagship import flagship_config
    from deepcoro_clip_tpu.losses.contrastive import clip_loss
    from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config
    from deepcoro_clip_tpu.models.video_encoder import video_encoder_from_config
    from deepcoro_clip_tpu.ops import pixels
    from deepcoro_clip_tpu.registry import register_all
    from deepcoro_clip_tpu.train.state import unbox_with_spec
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    register_all()
    # merge into any prior probes (each batch size runs in its own process)
    results = (json.loads((ART / "scaling.json").read_text())
               if (ART / "scaling.json").exists() else {})
    ART.mkdir(parents=True, exist_ok=True)
    probes = {16: (1e-4, 3e-4, 1e-3), 32: (1e-4, 1e-3)}
    probes = {only_B: probes[only_B]}
    for B, lrs in probes.items():
        ds = VideoClipDataset(
            str(CORPUS / "data.csv"), split="train", frames=16, resize=224,
            wire_dtype="uint8", target_label="Report",
        )
        cfg = flagship_config(batch_size=B, max_text_length=TEXT_LEN,
                              dropout=0.0)
        tok = get_tokenizer(vocab_size=cfg.text_vocab_size,
                            max_length=TEXT_LEN)
        batches = []
        for i in range(8):
            items = [ds[j] for j in range(i * B, (i + 1) * B)]
            b = collate_clip(items, tok, max_text_length=TEXT_LEN)
            batches.append({k: jnp.asarray(v) for k, v in b.items()
                            if isinstance(v, np.ndarray)})

        # per-channel pixel stats from a subsample (uint8 wire normalizes
        # on-device with these)
        sample = np.asarray(batches[0]["videos"][:4], np.float32).reshape(-1, 3)
        stats_mean = sample.mean(0).tolist()
        stats_std = (sample.std(0) + 1e-6).tolist()

        video_model = video_encoder_from_config(cfg)
        text_model = text_encoder_from_config(cfg)
        tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-4)

        def init_state(seed):
            r = jax.random.PRNGKey(seed)
            b0 = batches[0]
            vids = pixels.normalize_videos(b0["videos"], stats_mean, stats_std)
            vv = video_model.init({"params": r, "dropout": r}, vids,
                                  video_mask=b0["video_mask"])
            tv = text_model.init({"params": r, "dropout": r}, b0["input_ids"],
                                 attention_mask=b0["attention_mask"])
            params = {
                "video_encoder": unbox_with_spec(vv["params"])[0],
                "text_encoder": unbox_with_spec(tv["params"])[0],
                "log_temp": jnp.log(jnp.float32(cfg.temperature)),
            }
            return params, tx.init(params)

        def loss_fn(params, batch, rng):
            videos = pixels.normalize_videos(batch["videos"], stats_mean,
                                             stats_std)
            v = video_model.apply({"params": params["video_encoder"]}, videos,
                                  video_mask=batch["video_mask"],
                                  deterministic=False, rngs={"dropout": rng})
            t = text_model.apply({"params": params["text_encoder"]},
                                 batch["input_ids"],
                                 attention_mask=batch["attention_mask"],
                                 deterministic=False, rngs={"dropout": rng})
            return clip_loss(jnp.nan_to_num(v), jnp.nan_to_num(t),
                             params["log_temp"])["loss"]

        @jax.jit
        def step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        for lr in lrs:
            params, opt_state = init_state(0)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(
                lr, jnp.float32)
            rng = jax.random.PRNGKey(0)
            losses = []
            for i in range(300):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(
                    params, opt_state, batches[i % len(batches)], sub)
                if i % 10 == 0 or i == 299:
                    losses.append(round(float(loss), 4))
            key = f"B{B}_lr{lr:g}"
            plateau = float(np.log(B))
            results[key] = {
                "losses_every10": losses,
                "ln_B": round(plateau, 4),
                "final": losses[-1],
                "escaped_plateau": losses[-1] < 0.8 * plateau,
            }
            print(key, "final", losses[-1], "ln(B)", round(plateau, 3),
                  "escaped:", results[key]["escaped_plateau"], flush=True)
        (ART / "scaling.json").write_text(json.dumps(results))


# ------------------------------------------------------------------ #
# frozen-backbone linear probing (VERDICT round-3 #1): the reference's
# headline capability is probing AUROC (README.md:15-20 — stenosis 0.888,
# MACE 0.79, LVEF MAE 7.3%) out of linear_probing_runner.py:567-691. This
# stage trains the REAL LinearProbingRunner's MIL heads on this run's
# frozen CLIP backbone against the corpus's derived per-segment labels and
# reports AUROC + bootstrap CI per head vs a label-shuffled floor.
# ------------------------------------------------------------------ #

PROBE_EPOCHS = int(os.environ.get("DEEPCORO_QR_PROBE_EPOCHS", "10"))
# Few-shot probing protocol (VERDICT r4 #6): the full-corpus probe task
# saturates (every binary head 0.985+ even on the weakest backbone), so it
# cannot rank backbones. DEEPCORO_QR_PROBE_TRAIN_N=256 subsamples the
# probe TRAIN split to N clips (fixed rng; val untouched, labels clean) —
# representation quality shows up as label efficiency, and the head set /
# geometry stay identical to the published probe program (warm compile).
PROBE_TRAIN_N = int(os.environ.get("DEEPCORO_QR_PROBE_TRAIN_N", "0"))
PROBE_TAG = os.environ.get(
    "DEEPCORO_QR_PROBE_TAG", f"fs{PROBE_TRAIN_N}" if PROBE_TRAIN_N else "")
PROBE_DIR = RUN_DIR / ("probe" if not PROBE_TAG else f"probe_{PROBE_TAG}")
PROBE_ART = "probe.json" if not PROBE_TAG else f"probe_{PROBE_TAG}.json"


def _probe_heads():
    from deepcoro_clip_tpu.data.synthetic_angio import probe_label_columns

    cols = probe_label_columns()
    task = {c: ("regression" if c == "max_stenosis_pct" else "binary")
            for c in cols}
    loss = {c: ("huber" if task[c] == "regression" else "bce_logit")
            for c in cols}
    return cols, task, loss


def _write_probe_config():
    import yaml

    from deepcoro_clip_tpu.data.synthetic_angio import write_probe_labels

    labels_csv = write_probe_labels(CORPUS, CORPUS_SEED, 2, True)
    if PROBE_TRAIN_N:
        import pandas as pd

        df = pd.read_csv(labels_csv, sep="α", engine="python")
        tr = df[df.Split == "train"]
        keep = tr.sample(n=min(PROBE_TRAIN_N, len(tr)), random_state=123)
        PROBE_DIR.mkdir(parents=True, exist_ok=True)
        few_csv = PROBE_DIR / f"probe_labels_{PROBE_TAG}.csv"
        pd.concat([keep, df[df.Split != "train"]]).to_csv(
            few_csv, sep="α", index=False)
        labels_csv = few_csv
    run_out = _existing_run_dir()
    assert run_out is not None, "probe stage needs a finished train stage"
    from deepcoro_clip_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(run_out / "checkpoints")
    # DEEPCORO_QR_PROBE_CKPT pins the backbone: a name under the run's
    # checkpoints dir, or an absolute path (e.g. a snapshotted epoch under
    # probe_backbones/) — the few-shot separation protocol probes an early
    # vs a late checkpoint of the same run
    pinned = os.environ.get("DEEPCORO_QR_PROBE_CKPT", "")
    best = pinned or ckpt.find_best() or "checkpoint"
    meta = json.loads((run_out / "checkpoints" / "checkpoint.json").read_text())
    train_cfg = yaml.safe_load((RUN_DIR / "train_config.yaml").open())

    cols, task, loss = _probe_heads()
    cfg = dict(
        pipeline_project="DeepCORO_video_linear_probing",
        run_mode="train",
        data_filename=str(labels_csv),
        output_dir=str(PROBE_DIR / "outputs"),
        epochs=PROBE_EPOCHS,
        batch_size=BATCH,
        frames=16, resize=224, stride=1, num_workers=2,
        multi_video=True, num_videos=1,
        groupby_column="StudyInstanceUID",
        head_structure={c: 1 for c in cols},
        head_task=task,
        loss_structure=loss,
        head_lr={c: 1e-3 for c in cols},
        pooling_mode="attention",
        attention_hidden=256,
        video_encoder_checkpoint_path=(
            best if os.path.isabs(str(best))
            else str(run_out / "checkpoints" / best)),
        video_freeze_ratio=1.0,
        # video tower geometry MUST match the CLIP checkpoint's
        **{k: train_cfg[k] for k in (
            "vit_dim", "vit_depth", "vit_heads", "vit_patch",
            "vit_pool_stages", "use_cls_token", "embedding_dim", "dropout",
            "precision", "use_pallas_attention")},
        # reuse the CLIP run's resolved stats (same corpus; probing never
        # re-scans the train split)
        dataset_mean=meta.get("dataset_mean"),
        dataset_std=meta.get("dataset_std"),
        optimizer="AdamW", lr=1e-3, scheduler_name="cosine_with_warmup",
        max_grad_norm=1.0, early_stopping_patience=5,
        ci_n_bootstrap=1000, ci_confidence_level=0.95,
        use_wandb=False, seed=SEED, mono_wire=MONO,
    )
    PROBE_DIR.mkdir(parents=True, exist_ok=True)
    cfg_path = PROBE_DIR / "probe_config.yaml"
    yaml.safe_dump(cfg, cfg_path.open("w"))
    return cfg_path, best


def _probe_run_dir():
    outs = sorted((PROBE_DIR / "outputs").rglob("checkpoints"))
    return outs[-1].parent if outs else None


def _make_probe_runner(run_mode="train"):
    import yaml

    from deepcoro_clip_tpu.configs.parser import parse_config
    from deepcoro_clip_tpu.registry import RunnerRegistry, register_all
    from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

    setup_tpu_defaults()
    register_all()
    cfg_path = PROBE_DIR / "probe_config.yaml"
    if run_mode != "train":
        over = yaml.safe_load(cfg_path.open())
        over["run_mode"] = run_mode
        cfg_path = PROBE_DIR / f"probe_config_{run_mode}.yaml"
        yaml.safe_dump(over, cfg_path.open("w"))
    config = parse_config(["--base_config", str(cfg_path)])
    run_out = _probe_run_dir()
    if run_out is None:
        run_out = PROBE_DIR / "outputs" / "run"
        run_out.mkdir(parents=True, exist_ok=True)
    else:
        config.resume_training = True
    runner = RunnerRegistry.get(config.pipeline_project)(
        config, output_dir=str(run_out))
    return runner


def stage_probe_chunk(start: int, end: int):
    runner = _make_probe_runner()
    s = max(start, runner.maybe_resume())
    print(f"probe chunk: epochs [{s}, {end})", flush=True)
    runner.train(s, end)


def stage_probe_eval():
    """Final bootstrap-CI evaluation on the BEST probe checkpoint, plus the
    label-shuffled AUROC floor (200 permutations) per binary head."""
    import numpy as np
    import pandas as pd

    runner = _make_probe_runner(run_mode="val")
    best = runner.ckpt.find_best()
    if best:
        runner.state = runner.ckpt.restore(runner.state, best)
    metrics = runner.validate(split="val", epoch=998, save_predictions=True)

    run_out = _probe_run_dir()
    preds = pd.read_csv(run_out / "val" / "predictions_epoch_998.csv")
    cols, task, _ = _probe_heads()
    rng = np.random.default_rng(0)
    from deepcoro_clip_tpu.utils.metrics import compute_head_metrics

    out = {"best_checkpoint": best, "epochs": PROBE_EPOCHS,
           "backbone_checkpoint": str(runner.config
                                      .video_encoder_checkpoint_path),
           "n_val": int(len(preds)), "heads": {},
           "variant": PROBE_TAG or "full",
           "train_n": PROBE_TRAIN_N or None}
    for c in cols:
        p = preds[f"{c}_pred"].to_numpy(np.float32)
        t = preds[f"{c}_target"].to_numpy(np.float32)
        entry = {}
        for k, v in metrics.items():
            if not k.startswith(f"{c}/"):
                continue
            name = k.split("/", 1)[1]
            if isinstance(v, dict):  # bootstrap CI: {"point","lo","hi"}
                for kk, vv in v.items():
                    entry[f"{name}_{kk}"] = float(vv)
            elif isinstance(v, (int, float)):
                entry[name] = float(v)
        entry["task"] = task[c]
        entry["prevalence"] = float(t.mean()) if task[c] == "binary" else None
        # label-shuffled floor: what the same metric reads on destroyed
        # video->label correspondence (200 permutations, mean + p97.5)
        floors = []
        for _ in range(200):
            ts = rng.permutation(t)
            hm = compute_head_metrics(p, ts, task[c], with_ci=False)
            floors.append(hm.get("auc" if task[c] == "binary" else "mae"))
        floors = np.asarray([f for f in floors if f is not None], np.float64)
        if floors.size:
            entry["floor_mean"] = float(floors.mean())
            entry["floor_p97_5"] = float(np.percentile(floors, 97.5))
            entry["floor_p2_5"] = float(np.percentile(floors, 2.5))
        out["heads"][c] = entry
        print(c, {k: round(v, 4) for k, v in entry.items()
                  if isinstance(v, float)}, flush=True)
    ART.mkdir(parents=True, exist_ok=True)
    (ART / PROBE_ART).write_text(json.dumps(out, default=float))


def stage_probe():
    """Chunked probing train (subprocess per chunk; H2D-leak bound), then
    the CI + shuffled-floor eval, into artifacts/probe.json."""
    import subprocess

    if STUDY:
        print("probing uses the single-video corpus; skipped in study mode")
        return
    _write_probe_config()
    CHUNK = 3
    while True:
        run_out = _probe_run_dir()
        done = _last_epoch(run_out) if run_out else -1
        start = done + 1
        if start >= PROBE_EPOCHS:
            break
        try:
            r = subprocess.run(
                [sys.executable, str(Path(__file__).resolve()),
                 f"probe_chunk:{start}:{min(start + CHUNK, PROBE_EPOCHS)}"],
                cwd=str(REPO), timeout=5400,
            )
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc != 0:
            new_done = _last_epoch(_probe_run_dir())
            if new_done <= done:
                raise RuntimeError(
                    f"probe chunk failed (rc={rc}) at epoch {start}")
            print(f"probe chunk rc={rc}; progressed to {new_done}", flush=True)
    r = subprocess.run(
        [sys.executable, str(Path(__file__).resolve()), "probe_eval"],
        cwd=str(REPO), timeout=5400,
    )
    if r.returncode != 0:
        raise RuntimeError(f"probe eval failed rc={r.returncode}")


def stage_report():
    from dev._quality_report import write_report

    write_report(REPO, N_TRAIN, N_VAL, BATCH, TEXT_LEN)


STAGES = {
    "corpus": stage_corpus,
    "train": stage_train,
    "tiers": stage_tiers,
    "scaling": stage_scaling,
    "probe": stage_probe,
    "probe_eval": stage_probe_eval,
    "report": stage_report,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["corpus", "train", "tiers", "scaling", "report"]
    for n in names:
        print(f"=== stage {n} ===", flush=True)
        if n.startswith("train_chunk:"):
            _, a, b = n.split(":")
            stage_train_chunk(int(a), int(b))
        elif n.startswith("probe_chunk:"):
            _, a, b = n.split(":")
            stage_probe_chunk(int(a), int(b))
        elif n.startswith("tier_one:"):
            stage_tier_one(n.split(":", 1)[1])
        elif n.startswith("scaling_probe:"):
            stage_scaling_probe(int(n.split(":")[1]))
        elif n.startswith("scaling_recipe:"):
            stage_scaling_recipe(float(n.split(":")[1]))
        else:
            STAGES[n]()
