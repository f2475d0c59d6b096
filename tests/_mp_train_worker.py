"""Subprocess worker for tests/test_multihost_train.py.

Runs as one of two ``jax.distributed`` processes (2 virtual CPU devices
each -> a 4-device global data mesh) and executes the REAL
tasks/run_video_qa.main TRAINING run — scan gradient accumulation,
checkpointing and validation included — into a SHARED output_dir,
dumping the returned result dict to JSON.  Usage:

    python _mp_train_worker.py <pid> <cfg_json> <out_json> <port> [cli...]

Environment overrides (defaults preserve the original 2x2 topology):
    MP_NUM_PROCESSES  number of jax.distributed processes (default 2)
    MP_DEVS_PER_PROC  virtual CPU devices per process (default 2)
"""

import json
import os
import sys


def main():
    pid, cfg_path, out_json, port = (int(sys.argv[1]), sys.argv[2],
                                     sys.argv[3], sys.argv[4])
    extra = sys.argv[5:]
    n_proc = int(os.environ.get("MP_NUM_PROCESSES", "2"))
    n_dev = int(os.environ.get("MP_DEVS_PER_PROC", "2"))
    os.environ["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={n_dev}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_proc, process_id=pid)
    # establish the gloo clique over all 4 devices NOW, while both
    # processes are still in lockstep: the clique context is cached and
    # reused by every later executable.  Without this, the first
    # collective runs after minutes of 1-core-contended compilation and
    # the processes can reach it >30s apart — gloo's TCP connect
    # timeout — killing the run with "Gloo context initialization
    # failed: Connect timeout".
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("gloo-warmup")

    from sasvqa_tpu.tasks.run_video_qa import main as run_main
    res = run_main(["--task", "msvd_qa", "--config", cfg_path] + extra)
    out = {"global_step": int(res["global_step"]),
           "train_loss": float(res["train_loss"]),
           "val": dict(res["val"]), "process": pid}
    with open(out_json, "w") as f:
        json.dump(out, f)
    print(f"worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
