"""Flagship configuration: the TPU counterpart of the reference's default
pretraining recipe (mvit_v2_s, 16 frames @224, stride 2 — reference:
config/clip/base_config.yaml:15-46).

CoroViT-B/2x16x16: dim 512, depth 12, 4 heads (head_dim 128 = one MXU lane
tile), 16x224x224 input -> 8x14x14 = 1568 tokens + CLS. Text tower is
PubMedBERT-base shaped (12 x 768, vocab 30522).
"""

from __future__ import annotations

from deepcoro_clip_tpu.configs import ClipConfig


def flagship_config(**overrides) -> ClipConfig:
    d = dict(
        pipeline_project="DeepCORO_clip",
        model_name="mvit",
        frames=16,
        stride=2,
        resize=224,
        batch_size=8,
        multi_video=False,
        num_videos=1,
        vit_dim=512,
        vit_depth=12,
        vit_heads=4,
        vit_patch=[2, 16, 16],
        # multiscale: blocks 0-2 at 8x14x14=1568 tokens, 3-11 at 8x7x7=392
        # (matches the reference MViT's ~392 pooled tokens per clip,
        # SURVEY.md §5.7)
        vit_pool_stages=[3],
        use_cls_token=True,
        embedding_dim=512,
        num_heads=8,
        aggregator_depth=2,
        dropout=0.1,
        text_dim=768,
        text_depth=12,
        # 6 heads x Dh=128 (one full MXU lane tile per head) instead of
        # BERT's 12 x 64: same parameter tree ([768,768] QKVO kernels —
        # head count is a runtime reshape), ~7.3 ms/step faster f+b at
        # B=16/L=512 because Dh=64 pads half of every 128-lane attention
        # tile (measured, dev/text_tower_bench.py; docs/KERNELS.md).
        # YAML-driven and HF-imported runs keep the ClipConfig default (12,
        # reference PubMedBERT geometry); checkpoints record their own.
        text_heads=6,
        text_vocab_size=30522,
        max_text_length=512,
        temperature=0.0588,
        lr=1e-4,
        optimizer="AdamW",
        scheduler_name="cosine_with_warmup",
        loss_name="contrastive",
        precision="bf16",
        use_pallas_attention=True,
        # videos travel patch-major uint8 ([B, N, L, K], data/patch_wire.py):
        # the host does the space-to-depth (contiguous 48-byte memcpys,
        # native fv_space_to_depth_batch) and the device patchify is one
        # clean MXU dot. On-chip A/B at B=16/text-512: 160.5 -> 165.4
        # clips/s/chip, MFU 0.440 -> 0.454 (docs/KERNELS.md). H2D bytes are
        # identical; the wire itself is an exact permutation
        # (tests/models/test_patch_wire.py; fp32 wires agree on chip to
        # 1.4e-5) — under bf16 the layout change reorders matmul
        # accumulation, so embeddings differ by ~7e-3 rel, the same class
        # of noise as any XLA fusion change.
        patch_wire=True,
        epochs=30,
    )
    d.update(overrides)
    return ClipConfig.from_dict(d)


def tiny_config(**overrides) -> ClipConfig:
    """Small shapes for compile checks and CPU dry runs."""
    d = dict(
        frames=4,
        resize=32,
        batch_size=8,
        multi_video=True,
        num_videos=2,
        vit_dim=64,
        vit_depth=2,
        vit_heads=2,
        vit_patch=[2, 16, 16],
        text_dim=64,
        text_depth=2,
        text_heads=2,
        text_vocab_size=256,
        max_text_length=16,
        embedding_dim=32,
        num_heads=2,
        aggregator_depth=1,
        dropout=0.0,
        lr=1e-3,
        precision="fp32",
        use_pallas_attention=False,
        epochs=1,
    )
    d.update(overrides)
    return ClipConfig.from_dict(d)
