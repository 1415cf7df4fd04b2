"""Component-level timing of the flagship train step (run on TPU)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from deepcoro_clip_tpu.flagship import flagship_config
from deepcoro_clip_tpu.models.text_encoder import text_encoder_from_config
from deepcoro_clip_tpu.models.video_encoder import video_encoder_from_config
from deepcoro_clip_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main(B=16, text_len=512):
    cfg = flagship_config(batch_size=B, max_text_length=text_len)
    video = video_encoder_from_config(cfg)
    text = text_encoder_from_config(cfg)
    r = np.random.default_rng(0)
    vids = jnp.asarray(r.normal(size=(B, cfg.frames, cfg.resize, cfg.resize, 3)).astype(np.float32))
    ids = jnp.asarray(r.integers(0, 30522, (B, text_len)).astype(np.int32))
    am = jnp.ones_like(ids)
    k = jax.random.PRNGKey(0)
    vp = video.init({"params": k, "dropout": k}, vids)
    tp = text.init({"params": k, "dropout": k}, ids, attention_mask=am)

    vfwd = jax.jit(lambda p, x: video.apply(p, x, deterministic=True))
    tfwd = jax.jit(lambda p, i, m: text.apply(p, i, attention_mask=m, deterministic=True))
    vloss = jax.jit(jax.grad(
        lambda p, x: jnp.sum(
            video.apply(p, x, deterministic=True).astype(jnp.float32) ** 2)))
    tloss = jax.jit(jax.grad(
        lambda p, i, m: jnp.sum(
            text.apply(p, i, attention_mask=m, deterministic=True)
            .astype(jnp.float32) ** 2)))

    t_vf = timeit(vfwd, vp, vids)
    print(f"video fwd      B={B}: {t_vf*1e3:8.1f} ms  ({B/t_vf:6.1f} clips/s)")
    t_tf = timeit(tfwd, tp, ids, am)
    print(f"text  fwd      B={B}: {t_tf*1e3:8.1f} ms")
    t_vg = timeit(vloss, vp, vids)
    print(f"video fwd+bwd  B={B}: {t_vg*1e3:8.1f} ms  ({B/t_vg:6.1f} clips/s)")
    t_tg = timeit(tloss, tp, ids, am)
    print(f"text  fwd+bwd  B={B}: {t_tg*1e3:8.1f} ms")
    print(f"sum fwd+bwd: {(t_vg+t_tg)*1e3:.1f} ms -> {B/(t_vg+t_tg):.1f} clips/s upper bound")


if __name__ == "__main__":
    main()
