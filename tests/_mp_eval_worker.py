"""Subprocess worker for tests/test_multihost_eval.py.

Runs as one of two `jax.distributed` processes (2 virtual CPU devices
each -> a 4-device global data mesh) and executes the REAL
tasks/run_video_qa.validate over a synthetic split, dumping its scores
and per-question answers to a JSON file.  Usage:

    python _mp_eval_worker.py <process_id> <data_dir> <out_json> <port>

Environment overrides (defaults preserve the original 2x2 data-mesh):
    MP_NUM_PROCESSES  processes (default 2)
    MP_DEVS_PER_PROC  virtual CPU devices per process (default 2)
    MP_MESH_SHAPE     comma ints, e.g. "2,2" (default: all-devices data)
    MP_MESH_AXES      comma names, e.g. "data,fsdp"
    MP_VAL_BS         val/inference batch size (default 4)
"""

import json
import os
import sys


def main():
    pid, data_dir, out_json, port = (int(sys.argv[1]), sys.argv[2],
                                     sys.argv[3], sys.argv[4])
    n_proc = int(os.environ.get("MP_NUM_PROCESSES", "2"))
    n_dev = int(os.environ.get("MP_DEVS_PER_PROC", "2"))
    os.environ["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={n_dev}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_proc, process_id=pid)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sasvqa_tpu.core.config import ConfigDict
    from sasvqa_tpu.data.annotations import (build_common_answer_dict,
                                             group_datalist, load_datalist)
    from sasvqa_tpu.data.dataset import ClassifierCollator, VideoQADataset
    from sasvqa_tpu.data.frame_store import (FrameStoreReader,
                                             load_vidmapping)
    from sasvqa_tpu.data.tokenization import make_test_wordpiece
    from sasvqa_tpu.models.presets import build_model
    from sasvqa_tpu.parallel.mesh import make_mesh
    from sasvqa_tpu.tasks.run_video_qa import validate
    from sasvqa_tpu.train import steps as train_steps

    paths = json.load(open(os.path.join(data_dir, "paths.json")))
    datalist = load_datalist("msvd_qa", paths["val"])
    grouped = group_datalist(datalist, 1, is_train=False)
    ans2label = build_common_answer_dict((paths["train"],), 1000)
    ds = VideoQADataset("msvd_qa", grouped, FrameStoreReader(paths["h5"]),
                        load_vidmapping(paths["vidmapping"]), ans2label,
                        return_label=True, is_train=False)

    val_bs = int(os.environ.get("MP_VAL_BS", "4"))
    cfg = ConfigDict(task="msvd_qa", seed=0, debug=False,
                     img_size=32,
                     val_batch_size=val_bs, inference_batch_size=val_bs,
                     do_inference=0, max_txt_len=12, nframe=2,
                     samp_policy="random",
                     model=ConfigDict(pretrained_model="tiny-clip",
                                      vocab_size=512),
                     num_labels=1000, loss_type="ce", optim="adamw",
                     learning_rate=1e-4, decay="constant",
                     num_train_epochs=1, gradient_accumulation_steps=1)
    family, model = build_model(cfg)
    tok = make_test_wordpiece()
    collator = ClassifierCollator(tok, max_txt_len=12, nframe=2,
                                  samp_policy="random")

    mesh_shape = os.environ.get("MP_MESH_SHAPE")
    mesh_axes = os.environ.get("MP_MESH_AXES")
    if mesh_shape:
        mesh = make_mesh(shape=[int(x) for x in mesh_shape.split(",")],
                         axes=mesh_axes.split(",") if mesh_axes else None)
    else:
        mesh = make_mesh()                  # all global devices, data axis
    import jax.numpy as jnp
    probe = collator([ds.get_group(0)], rng=np.random.default_rng(0))
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.asarray(probe["text_input_ids"]),
        jnp.asarray(probe["text_attention_mask"]),
        jnp.asarray(probe["visual_inputs"]))
    # deterministic-seeded init -> identical values on both processes;
    # replicate onto the GLOBAL mesh (each process contributes its copy)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    state = train_steps.create_train_state(model, params, cfg,
                                           total_steps=1)
    # every state leaf must be a GLOBAL array in multi-controller jit
    # (an uncommitted single-device scalar is not addressable everywhere)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), state)
    eval_step = train_steps.make_classifier_eval_step(mesh)

    res = validate(state, ds, collator, cfg, family, tok, ans2label,
                   eval_step, mesh, tag="valid")
    out = {"scores": res["scores"],
           "answers": {str(r["question_id"]): int(r["answer"])
                       for r in res["qa_results"]}}
    with open(out_json, "w") as f:
        json.dump(out, f)
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
