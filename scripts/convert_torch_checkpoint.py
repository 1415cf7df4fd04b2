"""Convert a reference (HeartWise-AI/DeepCORO_CLIP) torch checkpoint into
flax parameter trees for this framework.

The reference saves monolithic torch dicts keyed by component (reference:
runners/video_constrative_learning_runner.py:1084-1093). Everything except
the mVIT video backbone is weight-isomorphic here and converts exactly
(pinned by tests/parity/): the full text tower, the video projection head,
the attention pool, the EnhancedVideoAggregator, and MIL/probing heads.
The mVIT backbone has no mapping (this repo's video tower is CoroViT) and
is reported as skipped — see docs/MIGRATION.md §4 for what to do about it.

Usage:
  python scripts/convert_torch_checkpoint.py checkpoint.pt --out converted.msgpack

Load the result with
  from deepcoro_clip_tpu.utils.torch_import import load_converted
  trees = load_converted("converted.msgpack")
and graft the per-component trees onto a TrainState's params (the keys
mirror module structure: trees["text_encoder"] replaces the text tower's
params except any head absent from the checkpoint; trees["video_encoder"]
holds the proj/aggregator/pool subtrees; trees["linear_probing"] expects
MultiInstanceLinearProbing(separate_video_attention=False)).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("checkpoint", help="reference .pt checkpoint path")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    ap.add_argument("--report", default=None,
                    help="optional path for the JSON conversion report")
    args = ap.parse_args(argv)

    from deepcoro_clip_tpu.utils.torch_import import (
        convert_reference_checkpoint,
        load_torch_checkpoint,
        save_converted,
    )

    ckpt = load_torch_checkpoint(args.checkpoint)
    trees, report = convert_reference_checkpoint(ckpt)
    if not trees:
        print("nothing convertible found in", args.checkpoint)
        return 1
    save_converted(trees, args.out)
    print(f"wrote {args.out}")
    print("converted:", ", ".join(report["converted"]))
    for k, n in report["skipped"].items():
        print(f"skipped:   {k} ({n} tensors)")
    if report["meta"]:
        print("metadata: ", json.dumps(report["meta"], default=str))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2, default=str)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
