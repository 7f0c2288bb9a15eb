"""Multi-host training end-to-end (VERDICT r3 item 2).

Launches TWO real OS processes connected by ``jax.distributed`` (gloo
CPU collectives, 2 virtual devices each = 4 global) training the tiny
fixture through the full ``train_fragment_core`` orchestration — batch
rows sharded over the global data mesh, params replicated, process 0
writing the artifacts — and pins the final exported params against a
SINGLE-process run on the same global batch stream (4 local devices, so
both runs shard the identical global batch 4 ways).

Mirrors how multi-host *predict* is tested (tests/test_e2e_commands.py):
real processes, real collectives, byte-level artifact comparison.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent

DRIVER = """
import sys
proc_id, n_proc, port, cfg, outdir = sys.argv[1:6]
import jax
jax.config.update("jax_platforms", "cpu")
from jaeger_tpu.parallel.multihost import initialize_distributed
if int(n_proc) > 1:
    initialize_distributed(f"127.0.0.1:{port}", int(n_proc), int(proc_id))
from jaeger_tpu.commands.train import train_fragment_core
r = train_fragment_core(cfg, output_dir=outdir, use_mesh=True)
losses = [h["loss"] for h in r["history"]["classifier"]]
print("FINAL_LOSSES", losses, flush=True)
"""


def _write_fixture(tmp_path):
    rng = np.random.default_rng(42)
    csv = tmp_path / "train.csv"
    pools = {0: "ATGCATGC", 1: "GGGGCCCCATGC", 2: "AAAATTTTATGC"}
    with open(csv, "w") as fh:
        for i in range(90):
            label = i % 3
            seq = "".join(rng.choice(list(pools[label]), size=100))
            fh.write(f"{label},{seq}\n")
    cfg = {
        "model": {
            "name": "mh_tiny", "seed": 1, "classifier_out_dim": 3,
            "class_label_map": [
                {"class": "chromosome", "label": 0},
                {"class": "phage", "label": 1},
                {"class": "plasmid", "label": 2},
            ],
            "embedding": {"use_embedding_layer": True,
                          "input_type": "translated",
                          "embedding_size": 8},
            "string_processor": {"crop_size": 30, "seq_onehot": False,
                                 "buffer_size": 100,
                                 "classifier_labels": [0, 1, 2],
                                 "classifier_labels_map": [0, 1, 2]},
            "representation_learner": {
                "hidden_layers": [
                    {"name": "masked_conv1d",
                     "config": {"filters": 8, "kernel_size": 3}},
                ],
                "pooling": "average",
            },
            "classifier": {
                "hidden_layers": [{"name": "dense",
                                   "config": {"units": 3}}],
            },
        },
        "training": {
            "batch_size": 16, "classifier_epochs": 2,
            "classifier_train_steps": 3,
            "optimizer": "adam",
            "optimizer_params": {"learning_rate": 0.01},
            "loss_classifier": "categorical_crossentropy",
            "loss_params_classifier": {"from_logits": True},
            "fragment_classifier_data": {
                "train": [{"class": ["a", "b", "c"],
                           "path": [str(csv)], "label": [0, 1, 2]}],
                # 90 rows / batch 16 -> a short 10-row FINAL eval batch,
                # which the multi-host eval must replicate (10 % 4 != 0)
                "validation": [{"class": ["a", "b", "c"],
                                "path": [str(csv)], "label": [0, 1, 2]}],
            },
        },
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    return cfg_path


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    # the subprocess must control its own device count: strip the
    # conftest's 8-virtual-device XLA flag, use JAX_NUM_CPU_DEVICES
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_NUM_CPU_DEVICES"] = str(n_local_devices)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return env


@pytest.mark.slow
def test_two_process_train_matches_single_process(tmp_path):
    cfg = _write_fixture(tmp_path)
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    port = _free_port()

    # --- two processes x 2 devices ---
    out_mh = tmp_path / "model_mh"
    procs = [
        subprocess.Popen(
            [sys.executable, str(driver), str(pid), "2", str(port),
             str(cfg), str(out_mh)],
            env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(tmp_path),
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"

    # identical losses on both processes (replicated metrics)
    lines = [next(ln for ln in o.splitlines() if "FINAL_LOSSES" in ln)
             for o in outs]
    assert lines[0] == lines[1]

    # only process 0 wrote the export/checkpoints
    assert (out_mh / "params.msgpack").exists()

    # --- single process x 4 devices, same global stream ---
    out_sp = tmp_path / "model_sp"
    p = subprocess.run(
        [sys.executable, str(driver), "0", "1", str(port), str(cfg),
         str(out_sp)],
        env=_env(4), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=str(tmp_path), timeout=600,
    )
    assert p.returncode == 0, p.stdout[-3000:]

    mh_bytes = (out_mh / "params.msgpack").read_bytes()
    sp_bytes = (out_sp / "params.msgpack").read_bytes()
    if mh_bytes == sp_bytes:
        return  # bitwise equal across topologies
    # collective reduction order may differ between 1 and 2 processes;
    # params must still agree to float32 tolerance
    from flax.serialization import msgpack_restore

    mh_tree = msgpack_restore(mh_bytes)
    sp_tree = msgpack_restore(sp_bytes)
    import jax

    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(mh_tree)[0],
        jax.tree_util.tree_flatten_with_path(sp_tree)[0],
    ):
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-6, err_msg=str(kp))
