"""Direct coverage for the health self-test and the reliability data
generator (previously exercised only via the CLI harness)."""

import numpy as np


def test_health_core_passes():
    from jaeger_tpu.commands.health import health_core

    assert health_core() == 0


def test_reliability_generator_outputs(tmp_path, rng):
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "tmc", Path(__file__).with_name("test_modern_convert.py"))
    tmc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tmc)

    from jaeger_tpu.dataops.reliability_generator import (
        generate_reliability_data,
    )
    from jaeger_tpu.models.builder import ModelBuilder

    b = ModelBuilder(tmc.CONFIG)
    model, variables = b.init()
    _, crop_nt = b.crop

    csv = tmp_path / "raw.csv"
    pools = {0: "ATGCATGC", 1: "GGGGCCCCATGC", 2: "AAAATTTTATGC"}
    with open(csv, "w") as fh:
        for i in range(90):
            seq = "".join(rng.choice(list(pools[i % 3]), size=200))
            fh.write(f"{i % 3},{seq}\n")

    paths = generate_reliability_data(
        model, variables, str(csv), str(tmp_path / "rel"), crop_nt,
        id_threshold=0.2, synthetic_ood_threshold=0.99,
        batch_size=32, seed=0,
    )
    train_path = paths["train"]["paths"][0]
    rows = [ln.split(",", 1) for ln in open(train_path)]
    labels = {r[0] for r in rows}
    assert labels <= {"0", "1"}
    assert len(rows) > 10
    # val split exists and is smaller
    val_path = paths["validation"]["paths"][0]
    n_val = sum(1 for _ in open(val_path))
    assert 0 < n_val < len(rows)

    # idempotent: second call reuses the files
    again = generate_reliability_data(
        model, variables, str(csv), str(tmp_path / "rel"), crop_nt)
    assert again["train"]["paths"] == paths["train"]["paths"]
