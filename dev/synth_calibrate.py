"""CPU calibration for the synthetic-corpus learnability regression test:
train the tiny CLIP recipe on the in-memory corpus and report unseen-video
retrieval R@1/R@5 (chance ~= 1/n_unique_texts)."""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np

from deepcoro_clip_tpu.data.collate import collate_clip
from deepcoro_clip_tpu.data.synthetic_angio import InMemorySyntheticDataset
from deepcoro_clip_tpu.data.tokenizer import get_tokenizer
from deepcoro_clip_tpu.flagship import tiny_config
from deepcoro_clip_tpu.parallel import MeshSpec, make_mesh
from deepcoro_clip_tpu.registry import register_all
from deepcoro_clip_tpu.train.clip import (
    build_clip_bundle,
    make_eval_step,
    make_train_step,
)


def run(n_train=128, n_val=64, epochs=40, lr=3e-3, seed=0):
    register_all()
    train = InMemorySyntheticDataset(n=n_train, size=32, frames=4, seed=seed,
                                     split="train")
    val = InMemorySyntheticDataset(n=n_val, size=32, frames=4, seed=seed,
                                   split="val")
    cfg = tiny_config(batch_size=16, max_text_length=32, lr=lr, epochs=epochs,
                      scheduler_name="cosine_with_warmup", dropout=0.0,
                      vit_dim=64, vit_depth=2, vit_heads=2, text_dim=64,
                      text_depth=2, text_heads=2, frames=4, resize=32)
    tok = get_tokenizer(vocab_size=cfg.text_vocab_size,
                        max_length=cfg.max_text_length)
    mesh = make_mesh(MeshSpec(data=4, model=2))
    bundle, state = build_clip_bundle(cfg, mesh, jax.random.PRNGKey(seed),
                                      steps_per_epoch=n_train // 16)
    step = make_train_step(bundle)
    evalf = make_eval_step(bundle)

    def batches(ds, B=16):
        out = []
        for i in range(0, len(ds) - B + 1, B):
            items = [ds[j] for j in range(i, i + B)]
            out.append(collate_clip(items, tok,
                                    max_text_length=cfg.max_text_length))
        return out

    tb = batches(train)
    rng = jax.random.PRNGKey(seed)
    t0 = time.perf_counter()
    for ep in range(epochs):
        for b in tb:
            rng, s1 = jax.random.split(rng)
            db = bundle.batch_sharding_fn(
                {k: v for k, v in b.items() if isinstance(v, np.ndarray)})
            state, m = step(state, db, s1, 0.0, 0.0, -1.0)
    train_s = time.perf_counter() - t0

    import jax.numpy as jnp

    v_embs, texts = [], []
    for b in batches(val):
        db = bundle.batch_sharding_fn(
            {k: v for k, v in b.items() if isinstance(v, np.ndarray)})
        out = evalf(state.params, db)
        v_embs.append(np.asarray(out["video_emb"], np.float32))
        texts.extend(b["texts"])
    v = np.concatenate(v_embs)
    uniq, tids = {}, []
    for t in texts:
        uniq.setdefault(t, len(uniq))
        tids.append(uniq[t])
    enc = tok(list(uniq), max_length=cfg.max_text_length,
              padding="max_length", truncation=True, return_tensors="np")
    temb = np.asarray(
        bundle.text_model.apply(
            {"params": jax.device_get(state.params)["text_encoder"]},
            jnp.asarray(enc["input_ids"], jnp.int32),
            attention_mask=jnp.asarray(enc["attention_mask"], jnp.int32),
            deterministic=True,
        ),
        np.float32,
    )
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    tn = temb / np.linalg.norm(temb, axis=1, keepdims=True)
    sim = vn @ tn.T
    tids = np.asarray(tids)
    ranks = 1 + np.sum(sim > sim[np.arange(len(tids)), tids][:, None], axis=1)
    res = {
        "n_unique_texts": len(uniq),
        "loss_final": float(m["loss"]),
        "R@1": float(np.mean(ranks == 1)),
        "R@5": float(np.mean(ranks <= 5)),
        "median_rank": float(np.median(ranks)),
        "train_seconds": round(train_s, 1),
    }
    return res


if __name__ == "__main__":
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    print(run(seed=seed))
