"""Bundle evaluation (train/evaluate.py): NPZ vs CSV path consistency.

The NPZ path feeds converter tokens straight to the model; the CSV path
goes through the engine's on-device encode. Identical metrics across the
two pin the converter/encoder agreement at the evaluation surface.
"""

import numpy as np


def _bundle_and_data(tmp_path, rng):
    import copy
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "tmc", Path(__file__).with_name("test_modern_convert.py"))
    tmc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tmc)

    from jaeger_tpu.dataops.convert import convert_dataset
    from jaeger_tpu.models.artifacts import save_model
    from jaeger_tpu.models.builder import ModelBuilder

    cfg = copy.deepcopy(tmc.CONFIG)
    cfg["model"]["string_processor"]["crop_size"] = 60  # 185 nt
    b = ModelBuilder(cfg)
    _, variables = b.init()
    bundle = tmp_path / "bundle"
    save_model(variables, cfg, bundle)

    pools = {0: "ATGCATGC", 1: "GGGGCCCCATGC", 2: "AAAATTTTATGC"}
    csv = tmp_path / "val.csv"
    with open(csv, "w") as fh:
        for i in range(60):
            lab = i % 3
            seq = "".join(rng.choice(list(pools[lab]), size=200))
            fh.write(f"{lab},{seq}\n")
    npz = tmp_path / "val_shuffled_translated_200.npz"
    convert_dataset(str(csv), str(npz), crop_size=185, compress="fast",
                    pad=True)
    return bundle, csv, npz


def test_npz_and_csv_paths_agree(tmp_path, rng):
    from jaeger_tpu.train.evaluate import (
        evaluate_bundle_on_csv, evaluate_bundle_on_npz,
    )

    bundle, csv, npz = _bundle_and_data(tmp_path, rng)
    row_npz, cm_npz, logits_npz, y_npz = evaluate_bundle_on_npz(
        bundle, npz, batch_size=16)
    row_csv, cm_csv, logits_csv, y_csv = evaluate_bundle_on_csv(
        bundle, csv, batch_size=16)

    assert row_npz == row_csv
    np.testing.assert_array_equal(cm_npz, cm_csv)
    np.testing.assert_array_equal(y_npz, y_csv)
    assert row_npz["n"] == 60
    assert set(row_npz) >= {"overall_accuracy", "macro_f1", "f1_class_0",
                            "precision_class_2", "recall_class_1"}
    assert cm_npz.sum() == 60


def test_benchmark_sweep_discovery(tmp_path, rng):
    """run_benchmark_evaluation discovers experiments and pairs NPZs."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "rbe",
        Path(__file__).resolve().parent.parent
        / "scripts" / "run_benchmark_evaluation.py",
    )
    rbe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rbe)

    bundle, csv, npz = _bundle_and_data(tmp_path, rng)
    runs = tmp_path / "runs"
    exp = runs / "experiment_tiny_200bp_trans"
    exp.mkdir(parents=True)
    import shutil

    for f in bundle.iterdir():
        shutil.copy(f, exp / f.name)
    # decoy: no bundle inside -> skipped
    (runs / "experiment_empty_100bp").mkdir()

    found = list(rbe.discover_experiments(runs, tmp_path))
    assert len(found) == 1
    name, bdir, val = found[0]
    assert name == "experiment_tiny_200bp_trans"
    assert val.name == "val_shuffled_translated_200.npz"


def test_plot_benchmark_results_renders(tmp_path):
    """plot_benchmark_results writes figures from a sweep CSV."""
    import importlib.util
    from pathlib import Path

    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "pbr",
        Path(__file__).resolve().parent.parent
        / "scripts" / "plot_benchmark_results.py",
    )
    pbr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pbr)

    import pandas as pd

    cm_path = tmp_path / "exp_cm.npy"
    np.save(cm_path, np.array([[5, 1], [2, 7]]))
    metrics = pd.DataFrame([
        {"overall_accuracy": 0.8, "macro_f1": 0.75, "f1_class_0": 0.7,
         "f1_class_1": 0.8, "length_bp": "500", "input_type": "translated",
         "experiment": "exp", "cm_path": str(cm_path)},
        {"overall_accuracy": 0.9, "macro_f1": 0.85, "f1_class_0": 0.9,
         "f1_class_1": 0.8, "length_bp": "1000",
         "input_type": "translated", "experiment": "exp2",
         "cm_path": str(cm_path)},
    ])
    out = tmp_path / "figs"
    out.mkdir()
    pbr.plot_f1_per_class(metrics, out)
    pbr.plot_accuracy_vs_length(metrics, out)
    pbr.plot_confusions(metrics, out)
    names = {p.name for p in out.glob("*.png")}
    assert "f1_per_class_bar.png" in names
    assert "accuracy_vs_length.png" in names
    assert "exp_cm.png" in names
    assert all(p.stat().st_size > 1000 for p in out.glob("*.png"))
