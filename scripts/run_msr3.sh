#!/usr/bin/env bash
# MSRVTT-QA config 3 (msrvtt_qa_base3: GIT-base, MIF question-caption/2, bs 16x32): equivalent of the
# reference counterpart but TPU-native (no CUDA_VISIBLE_DEVICES;
# the mesh uses every visible TPU chip).
set -euo pipefail
MODE=${1:-train}
CFG=configs/msrvtt_qa_base3.json
if [ "$MODE" = "train" ]; then
    rm -rf "$(python -c "import json;print(json.load(open('$CFG'))['output_dir'])")"
    python -m sasvqa_tpu.tasks.run_video_qa --task msrvtt_qa --config "$CFG"
else
    python -m sasvqa_tpu.tasks.run_video_qa --task msrvtt_qa --config "$CFG" --do_inference 1
fi
