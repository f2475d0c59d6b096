"""sasvqa_tpu — a TPU-native JAX/Flax/Pallas rebuild of SAS-VQA.

Self-Adaptive Sampling for Efficient Video Question-Answering (arXiv
2307.04192), re-designed TPU-first:

- ``core``      config / logging / metrics / checkpoint / rng
- ``data``      frame stores, annotation pipelines, host input pipeline
- ``sampling``  frame samplers: uniform / random / single / MDF / MIF
- ``models``    Flax CLIP / BLIP / GIT encoders + fusion heads
- ``ops``       Pallas TPU kernels (flash attention, banded similarity)
- ``parallel``  mesh construction + sharding helpers
- ``train``     jit train/eval steps, schedules, loops
- ``tasks``     MSVD-QA / MSRVTT-QA / TGIF-QA entry points
- ``tools``     offline stage A (frame extraction) and stage B (MIF)

The reference implementation being rebuilt lives at
``Clement25/SAS-VQA`` (PyTorch, single GPU); see SURVEY.md for the full
component inventory and file:line citations.
"""

__version__ = "0.1.0"
