"""Production-scale integrated run (VERDICT r4 #3): the REAL
tasks/run_video_qa training loop at the msvd_qa_base config against a
full-size on-disk store, for a bounded window, on the real chip.

Unlike bench.py (an isolated jitted step on synthetic device arrays),
this drives the integrated system — annotation loading, answer vocab,
HDF5 reads through FrameStoreReader, collation, DevicePrefetcher
staging, the scan-accum train step, in-loop validation with generative
decode, async eval snapshots and restore checkpoints — and reports:

    steps/s and qa-pairs/s over the steady-state window,
    input-pipeline overhead vs the isolated device step (bench git6),
    validation wall time, checkpoint overhead.

    python integrated_run.py [--steps 200] [--root /root/scale_store]

Differences from a true production run (no data/egress in this
sandbox): synthetic store content, random-init weights (training
dynamics are shape-identical; no convergence claim), built-in WordPiece
test vocab (host tokenization is a rounding error next to the 9.6 MB/row
frame reads).
"""

import argparse
import json
import math
import os
import re
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200,
                   help="target global steps (epochs derived)")
    p.add_argument("--root", default="/root/scale_store")
    p.add_argument("--out", default="/tmp/integrated_run")
    p.add_argument("--platform", default=None,
                   help="force cpu for a smoke run")
    p.add_argument("--train_q", type=int, default=30933)
    p.add_argument("--val_q", type=int, default=6415)
    p.add_argument("--num_videos", type=int, default=1970)
    p.add_argument("--store_name", default="main_k6",
                   help="sub-dir under --root (use a different name for "
                        "smoke shapes; the store is manifest-cached)")
    p.add_argument("--stage_pixels_u8", type=int, default=0,
                   choices=[0, 1],
                   help="stage pixels as uint8 (core/pixels.py wire "
                        "format): halves the H2D bytes vs the bf16 "
                        "default — the dominant cost of a tunnel-bound "
                        "integrated step")
    p.add_argument("--val_limit", type=int, default=0,
                   help="evaluate only the first N val/test QA pairs "
                        "(0 = all).  Bounds eval wall time in the "
                        "sandbox, where eval is tunnel-H2D-bound at "
                        "~5-8 qa/s; the store itself stays full-size")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])

    from sasvqa_tpu.tools.make_scale_store import make_scale_store
    # msvd_qa_base trains 6-frame GIT (img_len 6): stage-A K=6 store at
    # full MSVD video count
    paths = make_scale_store(
        os.path.join(args.root, args.store_name),
        num_videos=args.num_videos, k=6,
        n_questions={"train": args.train_q, "val": args.val_q,
                     "test": args.val_q})

    os.makedirs(args.out, exist_ok=True)
    if args.val_limit:
        for split in ("val", "test"):
            with open(paths[split]) as f:
                anno = json.load(f)
            cut = os.path.join(args.out, f"qa_{split}_limit.json")
            with open(cut, "w") as f:
                json.dump(anno[:args.val_limit], f)
            paths[split] = cut

    with open("configs/msvd_qa_base.json") as f:
        cfg = json.load(f)
    b, accum = cfg["train_batch_size"], cfg["gradient_accumulation_steps"]
    global_batch = b * accum
    epochs = max(1, math.ceil(args.steps * global_batch / args.train_q))
    cfg.update({
        "train_datasets": [{"name": "msvd_qa", "txt": paths["train"],
                            "img": paths["h5"]}],
        "val_datasets": [{"name": "msvd_qa", "txt": paths["val"],
                          "img": paths["h5"]}],
        "inference_txt_db": paths["test"],
        "inference_img_db": paths["h5"],
        "vid_mapping": paths["vidmapping"],
        "tokenizer_dir": None,
        "num_train_epochs": epochs,
        "num_valid": 2,            # one in-loop validation + the final
        "output_dir": os.path.join(args.out, "run"),
        "zero_eval": 0,
        "stage_pixels_u8": args.stage_pixels_u8,
    })
    cfg["model"].pop("pretrained_weights", None)  # no weights offline
    if args.platform:
        cfg["platform"] = args.platform
    cfg_path = os.path.join(args.out, "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)

    from sasvqa_tpu.tasks.run_video_qa import main as run_main
    t0 = time.time()
    res = run_main(["--task", "msvd_qa", "--config", cfg_path])
    wall = time.time() - t0

    # parse the run log: per-10-step wall marks + validation wall times
    log_dir = os.path.join(cfg["output_dir"], "log")
    log_file = next(os.path.join(log_dir, f) for f in os.listdir(log_dir)
                    if f.startswith("log"))
    step_marks, val_walls = [], []
    with open(log_file) as f:
        for line in f:
            m = re.search(r"step (\d+)/(\d+) .*\((\d+)s\)", line)
            if m:
                step_marks.append((int(m.group(1)), int(m.group(3))))
            m = re.search(r"\[(valid|test|final_valid|final_test)\] (\d+) "
                          r"examples in ([0-9.]+)s", line)
            if m:
                val_walls.append((m.group(1), int(m.group(2)),
                                  float(m.group(3))))

    # steady-state window: drop the first mark (includes compile)
    report = {"config": "integrated_msvd_qa_base",
              "global_steps": int(res["global_step"]),
              "global_batch_qa": global_batch,
              "wall_s": round(wall, 1),
              "train_loss": float(res["train_loss"])}
    if len(step_marks) >= 2:
        (s0, t0s), (s1, t1s) = step_marks[0], step_marks[-1]
        # exclude every IN-LOOP eval wall that fell inside the window:
        # run_validation() evaluates BOTH the valid and test splits
        # (run_video_qa.py:570-578); final_* runs after training ends,
        # past the last step mark
        val_inside = sum(w for tag, _, w in val_walls
                         if tag in ("valid", "test"))
        steady = (t1s - t0s) - val_inside
        steps = s1 - s0
        if steady > 0:
            report.update({
                "steady_steps_per_s": round(steps / steady, 4),
                "steady_qa_pairs_per_s": round(
                    steps * global_batch / steady, 1),
                "steady_ms_per_micro": round(
                    1000 * steady / (steps * accum), 2),
                "first_window_s": t0s,  # includes compile + cache warm
            })
        else:
            report["steady_window_note"] = (
                "in-loop eval walls exceed the step-mark window; "
                "rerun with more --steps or --val_limit")
    for tag, n, w in val_walls:
        report[f"eval_{tag}_s"] = w
        report[f"eval_{tag}_qa_per_s"] = round(n / w, 1)
    print(json.dumps(report), flush=True)
    return report


if __name__ == "__main__":
    main()
