"""Tensor-parallel (Megatron-style) parameter sharding over a ``model`` axis.

The reference has no intra-layer parallelism at all (single GPU,
hardcoded ``n_gpu=1`` — src/tasks/run_video_qa.py:392-393; its Horovod
data-parallel helpers are commented out, SURVEY.md §2.2).  This module
is the TPU-native extension for configs where data parallelism alone is
not enough (ViT-L towers, 16/32-frame sequences): column-parallel
projections (QKV / q,k,v / fc1 / intermediate) shard their OUTPUT
features over the ``model`` mesh axis, row-parallel projections
(out_proj / out_dense / fc2 / ffn.output) shard their INPUT features,
so each chip holds a head/hidden slice and XLA's SPMD partitioner
derives the single per-block psum from the parameter shardings alone —
no manual collectives, the standard Megatron pattern expressed as
layout annotations.

Scope notes:
- LayerNorms, embeddings, biases of row-parallel layers: replicated
  (they are O(D) — sharding them buys nothing and costs collectives).
- The LM head (GITForCausalLM's top-level ``output``) is
  column-parallel over the vocab; the loss's log-softmax reduces over
  the sharded axis with an XLA-inserted all-reduce.
- GIT's fused (D, 3D) qkv kernel shards the packed output axis in
  contiguous chunks, which do not align with the q/k/v thirds for
  tp > 3; XLA inserts one extra all-to-all per layer to regroup heads.
  The separate-projection families (CLIP MHA, BERT) shard head-aligned.
- Any dimension the tp size does not divide evenly falls back to
  replicated (sharding must be exact; uneven splits are a silent perf
  cliff, not an error).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_AXIS = "model"

# module names whose Dense shards OUTPUT features (column-parallel)
_COLUMN = frozenset({
    "qkv", "q_proj", "k_proj", "v_proj",       # CLIP/GIT attention
    "query", "key", "value",                   # BERT attention
    "fc1", "intermediate",                     # MLPs (CLIP / BERT / GIT)
})
# module names whose Dense shards INPUT features (row-parallel)
_ROW = frozenset({"out_proj", "out_dense", "fc2"})


def _classify(path) -> Optional[str]:
    """'column' | 'row' | None for one flattened param path."""
    names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    if len(names) < 2:
        return None
    module, leaf = names[-2], names[-1]
    parent = names[-3] if len(names) >= 3 else None
    if module in _COLUMN:
        return "column"
    if module in _ROW:
        return "row"
    if module == "output":
        # GitFFN/BertFFN second dense lives under an "ffn" scope;
        # the top-level GITForCausalLM LM head does not (models/git.py)
        return "row" if parent == "ffn" else "column"
    del leaf
    return None


def tp_param_sharding(params: Any, mesh: Mesh,
                      fsdp_axis: Optional[str] = None,
                      min_size: int = 2 ** 16) -> Any:
    """Per-leaf NamedSharding tree implementing Megatron TP.

    ``fsdp_axis``: optionally ZeRO-shard the non-TP dimension of every
    TP-sharded kernel, and the largest axis of large non-TP params
    (mesh must carry both axes).  Composes with the ``data`` batch axis
    for a full (data, fsdp, model) 3D mesh.
    """
    assert TP_AXIS in mesh.axis_names, mesh.axis_names
    tp = mesh.shape[TP_AXIS]
    n_fsdp = mesh.shape[fsdp_axis] if fsdp_axis else 1

    def fsdp_fallback(leaf):
        # the shared ZeRO per-leaf rule (parallel/mesh.py) — one policy
        # for both the pure-FSDP and TP+FSDP compositions
        if fsdp_axis:
            from sasvqa_tpu.parallel.mesh import fsdp_leaf_sharding
            return fsdp_leaf_sharding(leaf, mesh, fsdp_axis, n_fsdp,
                                      min_size)
        return NamedSharding(mesh, P())

    def shard_of(path, leaf):
        kind = _classify(path)
        ndim = getattr(leaf, "ndim", 0)
        if kind == "column":
            if ndim == 2 and leaf.shape[1] % tp == 0:
                other = (fsdp_axis if fsdp_axis
                         and leaf.shape[0] % n_fsdp == 0 else None)
                return NamedSharding(mesh, P(other, TP_AXIS))
            if ndim == 1 and leaf.shape[0] % tp == 0:   # bias
                return NamedSharding(mesh, P(TP_AXIS))
            return fsdp_fallback(leaf)
        if kind == "row":
            if ndim == 2 and leaf.shape[0] % tp == 0:
                other = (fsdp_axis if fsdp_axis
                         and leaf.shape[1] % n_fsdp == 0 else None)
                return NamedSharding(mesh, P(TP_AXIS, other))
            # row-parallel bias stays replicated (added after the psum)
            return fsdp_fallback(leaf)
        return fsdp_fallback(leaf)

    return jax.tree_util.tree_map_with_path(shard_of, params)


def count_sharded(shardings: Any) -> int:
    """Number of leaves with a non-replicated spec (test/debug aid)."""
    return sum(s.spec != P()
               for s in jax.tree_util.tree_leaves(shardings))
