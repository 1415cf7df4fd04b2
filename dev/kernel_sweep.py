"""Flash-attention block_q sweep at flagship shapes (run on TPU)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from deepcoro_clip_tpu.ops import build_rope3d_tables
from deepcoro_clip_tpu.ops.attention import multi_head_attention
from deepcoro_clip_tpu.ops.flash_attention import flash_attention
from deepcoro_clip_tpu.utils.compile_cache import setup_tpu_defaults

setup_tpu_defaults()


def scan_time(fn, init, n=8):
    @jax.jit
    def many(x):
        def body(c, _):
            return fn(c), None
        o, _ = jax.lax.scan(body, x, None, length=n)
        return o

    o = many(init)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = many(init)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n


def bench_shape(B, H, T, HH, WW, Dh, label):
    L = 1 + T * HH * WW
    t = build_rope3d_tables(Dh, T, HH, WW, n_special=1)
    sin, cos = jnp.asarray(t.sin), jnp.asarray(t.cos)
    r = np.random.default_rng(0)
    qkv = [jnp.asarray(r.normal(size=(B, H, L, Dh)).astype(np.float32))
           .astype(jnp.bfloat16) * 0.3 for _ in range(3)]
    q, k, v = qkv

    print(f"--- {label}: B={B} H={H} L={L} Dh={Dh}")
    for bq in (128, 256, 512):
        def fb(x, bq=bq):
            return jax.grad(
                lambda q: jnp.sum(
                    flash_attention(q, k, v, sin=sin, cos=cos,
                                    backend="pallas", block_q=bq)
                    .astype(jnp.float32) ** 2))(x)
        try:
            dt = scan_time(fb, q)
            print(f"  pallas bq={bq}: {dt*1e3:7.2f} ms f+b")
        except Exception as e:
            print(f"  pallas bq={bq}: failed {type(e).__name__}")

    def fb_xla(x):
        return jax.grad(
            lambda q: jnp.sum(
                multi_head_attention(q, k, v, sin=sin, cos=cos)
                .astype(jnp.float32) ** 2))(x)
    dt = scan_time(fb_xla, q)
    print(f"  xla          : {dt*1e3:7.2f} ms f+b")


if __name__ == "__main__":
    bench_shape(16, 4, 8, 14, 14, 128, "high-res stage")
    bench_shape(16, 4, 8, 7, 7, 128, "pooled stage")
    # text shape (with mask, no rope)
    B, H, L, Dh = 16, 12, 512, 64
    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.normal(size=(B, H, L, Dh)).astype(np.float32))
               .astype(jnp.bfloat16) * 0.3 for _ in range(3))
    mask = jnp.ones((B, L), jnp.int32)
    print(f"--- text: B={B} H={H} L={L} Dh={Dh}")
    for bq in (256, 512):
        def fb(x, bq=bq):
            return jax.grad(
                lambda q: jnp.sum(
                    flash_attention(q, k, v, kv_mask=mask, backend="pallas",
                                    block_q=bq).astype(jnp.float32) ** 2))(x)
        dt = scan_time(fb, q)
        print(f"  pallas bq={bq}: {dt*1e3:7.2f} ms f+b")

    def fb_xla(x):
        return jax.grad(
            lambda q: jnp.sum(
                multi_head_attention(q, k, v, kv_mask=mask != 0)
                .astype(jnp.float32) ** 2))(x)
    dt = scan_time(fb_xla, q)
    print(f"  xla          : {dt*1e3:7.2f} ms f+b")
