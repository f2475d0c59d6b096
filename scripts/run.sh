#!/usr/bin/env bash
# MSVD-QA config 1 (msvd_qa_base: GIT-base, uniform/1-frame, bs 6x72): equivalent of the
# reference counterpart but TPU-native (no CUDA_VISIBLE_DEVICES;
# the mesh uses every visible TPU chip).
set -euo pipefail
MODE=${1:-train}
CFG=configs/msvd_qa_base.json
if [ "$MODE" = "train" ]; then
    rm -rf "$(python -c "import json;print(json.load(open('$CFG'))['output_dir'])")"
    python -m sasvqa_tpu.tasks.run_video_qa --task msvd_qa --config "$CFG"
else
    python -m sasvqa_tpu.tasks.run_video_qa --task msvd_qa --config "$CFG" --do_inference 1
fi
