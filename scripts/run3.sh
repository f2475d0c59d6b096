#!/usr/bin/env bash
# MSVD-QA config 3 (msvd_qa_base3: CLIP ViT-B/16 classifier, single/4, bs 8x4): equivalent of the
# reference counterpart but TPU-native (no CUDA_VISIBLE_DEVICES;
# the mesh uses every visible TPU chip).
set -euo pipefail
MODE=${1:-train}
CFG=configs/msvd_qa_base3.json
if [ "$MODE" = "train" ]; then
    rm -rf "$(python -c "import json;print(json.load(open('$CFG'))['output_dir'])")"
    python -m sasvqa_tpu.tasks.run_video_qa --task msvd_qa --config "$CFG"
else
    python -m sasvqa_tpu.tasks.run_video_qa --task msvd_qa --config "$CFG" --do_inference 1
fi
