#!/usr/bin/env bash
# Checkpoint-day readiness drill (VERDICT r3 #5): prove the entire
# generate -> load -> convert -> sample -> CLI path at REAL model geometry
# without network egress, so the only untested thing left on the day real
# weights arrive is the weight values themselves.
#
#   1. writes a full-size synthetic HF-layout checkpoint (866M-param SD2
#      UNet, KL VAE, transformers-inventory text tower, TAESD, scheduler)
#   2. runs scripts/verify_checkpoint.py against it (load + one guided step)
#   3. runs the predict CLI end-to-end with --model original pointing at it
#
# Usage: scripts/checkpoint_drill.sh [WORKDIR]
#   WORKDIR defaults to /tmp/dct_checkpoint_drill. Set DRILL_BACKEND=cpu to
#   force the CPU backend (slow at real geometry: ~10 min; on a TPU the
#   whole drill is a few minutes, dominated by compile).
set -euo pipefail
cd "$(dirname "$0")/.."

WORK="${1:-/tmp/dct_checkpoint_drill}"
export DRILL_WORK="$WORK"
export JAX_PLATFORMS="${DRILL_BACKEND:-${JAX_PLATFORMS:-}}"
PY=(python)

echo "=== [1/3] generating full-size synthetic checkpoint under $WORK"
"${PY[@]}" scripts/make_synthetic_checkpoint.py "$WORK/marigold-synth" \
    --taesd-out "$WORK/taesd"

echo "=== [2/3] verify_checkpoint (load + param counts + one guided step)"
"${PY[@]}" scripts/verify_checkpoint.py "$WORK/marigold-synth" \
    --taesd "$WORK/taesd"

echo "=== [3/3] predict CLI end-to-end against the local checkpoint"
"${PY[@]}" - <<'EOF'
import numpy as np
from pathlib import Path
import os
from depth_completion_tpu.io.image import save_img_array
rng = np.random.default_rng(0)
ds = Path(os.environ.get("DRILL_WORK", "/tmp/dct_checkpoint_drill")) / "data" / "scene"
for i in range(1):
    save_img_array(rng.integers(1, 255, size=(480, 640, 3)).astype(np.uint8),
                   ds / "image" / f"{i:05d}.png")
    sparse = np.zeros((480, 640, 3), np.uint8)
    mask = rng.random((480, 640)) < 0.002
    sparse[mask, 0] = rng.integers(10, 250, mask.sum()).astype(np.uint8)
    save_img_array(sparse, ds / "sparse" / f"{i:05d}.png")
EOF
"${PY[@]}" -m depth_completion_tpu.cli.predict \
    "$WORK/data" "$WORK/out" \
    --model original --checkpoint-dir "$WORK/marigold-synth" \
    --taesd-dir "$WORK/taesd" --vae light \
    --steps "${DRILL_STEPS:-4}" --res "${DRILL_RES:-768}" --vis false \
    --compress npy

"${PY[@]}" - <<'EOF'
import glob, os
import numpy as np
work = os.environ.get("DRILL_WORK", "/tmp/dct_checkpoint_drill")
fs = sorted(glob.glob(work + "/out/scene/dense/*.npy"))
assert fs, "no dense outputs written"
for f in fs:
    a = np.load(f)
    assert a.shape == (480, 640, 1) and np.isfinite(a).all(), (f, a.shape)
print(f"DRILL OK: {len(fs)} dense frames, finite, full SD2 geometry")
EOF
