#!/usr/bin/env bash
# The reference's run_demo.sh (`/root/reference/run_demo.sh:1-97`) holds one
# active + four commented invocations covering the five generate modes, with
# the author's local absolute paths. This equivalent is RUNNABLE as-is:
# every mode works without external checkpoints (synthetic tracks /
# built-in flow tracker / fixtures), and scales to the flagship setup by
# swapping --random_init for --checkpoint_path and dropping the tiny sizes.
#
# Perception checkpoints (optional, enable the learned models):
#   export FLEXAM_DELTA_CKPT=checkpoints/Wan2.2-Fun-5B-FLEXAM/densetrack3d.pth
#   export FLEXAM_UNIDEPTH_CKPT=checkpoints/unidepth-v2-vitl14
#   export FLEXAM_MOGE_CKPT=checkpoints/moge2-vitl
set -e

SIZE="--sample_size 512 896 --video_length 97"
TINY="--random_init tiny --platform cpu --sample_size 64 64 --video_length 9 --num_inference_steps 2"
MODE=${1:-tiny}
if [ "$MODE" = tiny ]; then COMMON="$TINY"; H=64; W=64; T=9
else COMMON="$SIZE --random_init 5b"; H=512; W=896; T=97; fi
# with real weights: COMMON="$SIZE --checkpoint_path checkpoints/Wan2.2-Fun-5B-FLEXAM"

# synthesize the repaint/mask inputs the fg/bg modes need (stand-ins for
# the reference's FLUX-repainted frames and segmentation masks)
python - "$H" "$W" "$T" <<'PYEOF'
import sys
import numpy as np
from PIL import Image
from flexam_tpu.utils.media import save_video
h, w, t = map(int, sys.argv[1:4])
rng = np.random.RandomState(0)
Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
    "demo_repaint.png")
om = np.zeros((h, w), np.uint8)
om[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 255
Image.fromarray(om).save("demo_object_mask.png")
mv = np.tile((om[None, None] / 255.0).astype(np.float32)[None],
             (1, 3, t, 1, 1))
save_video(mv, "demo_mask.mp4", fps=16)
PYEOF

# 1. Motion transfer (full_edit): tracks from the input video itself
#    (DELTA if FLEXAM_DELTA_CKPT is set, else the flow baseline; here:
#    synthetic tracks so it runs with zero inputs)
python -m flexam_tpu.demo $COMMON \
    --prompt "a bright orange fox stretches on a bed of autumn leaves" \
    --generate_type full_edit --synthetic_tracks --density 10 \
    --output_dir output/motion_transfer

# 2. Foreground edit: new foreground appearance under the source motion
python -m flexam_tpu.demo $COMMON \
    --prompt "a gray cat walks across a snow-covered slope" \
    --generate_type foreground_edit --synthetic_tracks --density 15 \
    --repaint demo_repaint.png --mask_path demo_mask.mp4 \
    --output_dir output/foreground_edit

# 3. Background edit
python -m flexam_tpu.demo $COMMON \
    --prompt "a fluffy white fox in a vibrant spring meadow" \
    --generate_type background_edit --synthetic_tracks --density 15 \
    --repaint demo_repaint.png --mask_path demo_mask.mp4 \
    --output_dir output/background_edit

# 4. Camera control on video input: poses solved from the tracks
#    themselves (robust Kabsch) — no VGGT/Pi3 fixture needed
python -m flexam_tpu.demo $COMMON \
    --prompt "the same scene orbited by a slow camera" \
    --generate_type full_edit --synthetic_tracks \
    --camera_motion "trans 0.1 0 0.2; rot y 10" \
    --output_dir output/camera_control

# 5. Object manipulation (+ camera), composed like the reference's runs
python -m flexam_tpu.demo $COMMON \
    --prompt "the foreground object drifts up and to the left" \
    --generate_type full_edit --synthetic_tracks \
    --object_motion up --object_mask demo_object_mask.png \
    --camera_motion "trans 0.05 0 0" \
    --output_dir output/object_motion

echo "all five generate modes completed under output/"
