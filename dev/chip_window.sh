#!/bin/sh
# Round-3 chip-window measurement queue (run when the chip is free after
# the seed-1 quality run). Each step is bounded; results land in
# /tmp/chipwin_*.log for the session to fold into docs.
set -x
cd "$(dirname "$0")/.."

# 1. exp2-softmax tower A/B + compiled fwd agreement
timeout 3000 python dev/exp2_bench.py > /tmp/chipwin_exp2_tower.log 2>&1

# 2. compiled kernel parity with exp2 ON (standard + packed kernels)
DEEPCORO_EXP2_SOFTMAX=1 timeout 900 python - > /tmp/chipwin_exp2_parity.log 2>&1 <<'EOF'
import jax, jax.numpy as jnp, numpy as np
from deepcoro_clip_tpu.ops import build_rope3d_tables
from deepcoro_clip_tpu.ops.flash_attention import flash_attention
from deepcoro_clip_tpu.ops import flash_attention_packed as fap
from deepcoro_clip_tpu.ops.attention import multi_head_attention
T,H,W,Dh = 8,14,14,128; L = 1+T*H*W
t = build_rope3d_tables(Dh,T,H,W,n_special=1)
r = np.random.default_rng(0)
q,k,v = (jnp.asarray(r.normal(size=(2,4,L,Dh)).astype(np.float32))*0.3 for _ in range(3))
sin,cos = jnp.asarray(t.sin), jnp.asarray(t.cos)
p = flash_attention(q,k,v,sin=sin,cos=cos,backend="pallas")
x = multi_head_attention(q,k,v,sin=sin,cos=cos)
print("standard exp2 fwd diff", float(jnp.max(jnp.abs(p-x))))
B,Lp,D = 2, 512, 512
qp,kp,vp = (jnp.asarray(r.normal(size=(B,Lp,D)).astype(np.float32))*0.3 for _ in range(3))
out = fap.flash_attention_packed(qp,kp,vp,num_heads=4,backend="pallas")
qh = qp.reshape(B,Lp,4,128).transpose(0,2,1,3)
kh = kp.reshape(B,Lp,4,128).transpose(0,2,1,3)
vh = vp.reshape(B,Lp,4,128).transpose(0,2,1,3)
ref = multi_head_attention(qh,kh,vh).transpose(0,2,1,3).reshape(B,Lp,D)
print("packed exp2 fwd diff", float(jnp.max(jnp.abs(out-ref))))
EOF

# 3. full-step A/B: current defaults, then exp2 on
timeout 3000 python bench.py > /tmp/chipwin_bench_base.log 2>&1
DEEPCORO_EXP2_SOFTMAX=1 timeout 3000 python bench.py > /tmp/chipwin_bench_exp2.log 2>&1

# 4. stale variant re-measure at current defaults (packed + patch wire)
DEEPCORO_BENCH_TEXT=128 timeout 3000 python bench.py 16 > /tmp/chipwin_bench_text128.log 2>&1
DEEPCORO_BENCH_VIDEOS=4 timeout 3000 python bench.py 8 > /tmp/chipwin_bench_study.log 2>&1

# 5. per-study inference, uncontended host
timeout 1200 python scripts/bench_inference.py > /tmp/chipwin_infer.log 2>&1

tail -1 /tmp/chipwin_bench_base.log /tmp/chipwin_bench_exp2.log \
        /tmp/chipwin_bench_text128.log /tmp/chipwin_bench_study.log
