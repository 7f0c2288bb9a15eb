"""End-to-end contigs/s + windows/s: FASTA in, TSV out — both pipelines.

The unmeasured half of BASELINE.json's north-star metric (round-2
verdict item 1): a like-for-like wall-clock of the COMPLETE predict
pipeline — reference (`jaeger.commands.predict.run_core`, live in this
image on CPU, with tests/refstubs providing its byte-exact native deps)
vs jaeger_tpu (`jaeger_tpu.commands.predict.run_core`) — on the same
synthetic metagenome with the SAME flagship-scale model weights (built
once by the reference DynamicModelBuilder, converted losslessly by
`convert_modern_weights`; TSV byte-parity of that conversion is pinned
in tests/test_e2e_live_reference.py).

Separately reports the chip composite: the host-ingest rate measured on
this FASTA (threaded windowing+encode, no device) combined with the
device-path rate (device-resident program, bench.py's measurement) as a
pipelined min() — because the axon relay's ~5 MB/s host<->device link
would make a literal chip end-to-end measure the harness tunnel, not
the hardware (CLAUDE.md; on directly-attached TPU hosts the link is
>1000x faster and the pipeline overlaps ingest with compute).

Usage:
  python experiments/e2e_bench.py --mb 20 [--chip] [--out E2E_BENCH.json]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO))

FSIZE = 2000   # the reference's documented real-world knobs
STRIDE = 2000  # (cli.py:135-143, usage.md:43-51)
BATCH = 512


def make_metagenome(path: Path, target_mb: float, seed: int = 7) -> dict:
    """Deterministic synthetic metagenome: log-uniform contig lengths
    3 kb..100 kb, GC-skewed base composition per contig, occasional
    N runs and soft-masked stretches (realistic, mostly-dense input)."""
    rng = np.random.default_rng(seed)
    total = 0
    n_contigs = 0
    target = int(target_mb * 1e6)
    bases = np.frombuffer(b"ACGT", np.uint8)
    with path.open("w") as fh:
        while total < target:
            if n_contigs % 50 == 3:
                # a few >=100 kb contigs so CPD/boundary/att-site costs
                # are visible in the prophage mode (VERDICT r3 item 6)
                ln = int(rng.integers(100_000, 300_000))
            else:
                ln = int(np.exp(rng.uniform(np.log(3_000),
                                            np.log(100_000))))
            gc = rng.uniform(0.3, 0.65)
            p = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
            seq = rng.choice(bases, size=ln, p=p)
            if rng.random() < 0.15:  # an N run (assembly gap)
                at = int(rng.integers(0, ln - 200))
                seq[at:at + int(rng.integers(10, 200))] = ord("N")
            arr = seq.tobytes().decode()
            if rng.random() < 0.2:  # soft-masked repeat stretch
                at = int(rng.integers(0, max(1, ln - 500)))
                w = int(rng.integers(50, 500))
                arr = arr[:at] + arr[at:at + w].lower() + arr[at + w:]
            fh.write(f">synth_{n_contigs} len={ln}\n")
            for s in range(0, ln, 80):
                fh.write(arr[s:s + 80] + "\n")
            total += ln
            n_contigs += 1
    return {"contigs": n_contigs, "bases": total}


def build_flagship_artifact(workdir: Path) -> Path:
    """Build + seed-randomize + save the flagship-scale model with the
    REFERENCE builder so both pipelines consume the same artifact."""
    import refstubs

    refstubs.install()
    import yaml
    from jaeger.nnlib import builder as ref_builder
    from jaeger.utils.misc import load_model_config as ref_load

    cfg = ref_load(Path(
        "/root/reference/train_config/"
        "nn_config_1500bp_nmd_merge_6_class_zeus.yaml"))
    m = cfg["model"]
    m["mode"] = "inference"
    sp = m["string_processor"]
    # single-crop inference contract (crop_sizes is a training knob)
    sp["crop_size"] = sp.pop("crop_sizes")[0]
    sp.pop("validation_crop_sizes", None)
    cfg["training"] = {
        "classifier_dir": str(workdir / "ck" / "classifier"),
        "reliability_dir": str(workdir / "ck" / "reliability"),
        "model_saving": {
            "path": str(workdir / "model"),
            "save_weights": True, "save_exec_graph": True,
            "save_embedding_graph": False,
        },
    }
    cfg["force"] = True
    cfg_path = workdir / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    cfg["config_path"] = str(cfg_path)

    b = ref_builder.DynamicModelBuilder(cfg)
    with contextlib.redirect_stdout(io.StringIO()):
        models = b.build_fragment_classifier()
    jm = models["jaeger_model"]
    rng = np.random.default_rng(0)
    for w in jm.weights:
        if "variance" in w.path:
            vals = rng.uniform(0.5, 1.5, size=w.shape)
        else:
            vals = rng.uniform(-0.2, 0.2, size=w.shape)
        w.assign(vals.astype("float32"))
    b.save_model(jm)
    n_params = sum(int(np.prod(w.shape)) for w in jm.weights)
    print(f"[artifact] flagship built: {n_params:,} weights", flush=True)
    return workdir / "model"


def convert_bundle(model_dir: Path, out: Path) -> Path:
    from jaeger_tpu.models.artifacts import save_model
    from jaeger_tpu.models.modern_convert import convert_modern_weights
    from jaeger_tpu.utils.config import load_model_config

    project = next(model_dir.glob("*_project.yaml"))
    h5 = next(model_dir.glob("*.weights.h5"))
    cfg = load_model_config(project)
    variables = convert_modern_weights(cfg, h5)
    save_model(variables, cfg, out)
    return out


def seed_refine_calibrations(model_dir: Path, bundle: Path) -> None:
    """Write a shared synthetic refinement calibration into BOTH
    bundles (same taus, each side's expected filename) so --refine
    exercises the real refinement path instead of warn-skipping."""
    import yaml as _yaml

    from jaeger_tpu.postprocess import refinement as R

    # permissive taus: the bench model's weights are random, so fitted
    # thresholds would abstain everything (empty aggregate, no refined
    # output, and an unrepresentative fast path). -inf thresholds keep
    # every window so the refine mode pays its full representative cost
    # (features + merge rules + aggregation over all windows).
    taus = {c: {"logit": -1e9, "margin": -1e9, "n": 1000}
            for c in R.CLASSES}
    # our bundle: <model.name>_refine.yaml next to params
    cfg = _yaml.safe_load((bundle / "project.yaml").read_text())
    name_ours = cfg.get("model", {}).get("name", "model")
    R.save_refinement(taus, bundle / f"{name_ours}_refine.yaml",
                      jaeger_model=name_ours, quantile=0.05,
                      val_cohort="e2e-bench synthetic")
    # reference bundle: next to the exec graph, named by its model key
    proj = next(model_dir.glob("*_project.yaml"))
    name_ref = proj.name.replace("_project.yaml", "")
    R.save_refinement(taus, model_dir / f"{name_ref}_refine.yaml",
                      jaeger_model=name_ref, quantile=0.05,
                      val_cohort="e2e-bench synthetic")


MODES = {
    "default": {},
    "prophage": {"prophage": True},
    "refine": {"refine": True},
    "crf": {"crf": True},
    # `predict --int8 auto` (round-5 verdict item 9): int8 MXU program
    # on full-length unambiguous windows only, float on short/masked —
    # ours-only (the reference has no int8 serving mode on CPU TF)
    "int8_auto": {"int8_auto": True, "ours_only": True},
}


def run_reference(model_dir: Path, fasta: Path, out: Path,
                  mode: str = "default") -> float:
    # reference package + its byte-exact native-dep stubs (also puts
    # /root/reference/src on sys.path; idempotent — the artifact-build
    # phase may have done it already, but that phase is cached/skipped
    # on reruns)
    import refstubs

    refstubs.install()
    import jaeger.commands.predict as ref_predict

    ref_predict.version = lambda *_: "0.0.0-live"
    m = MODES[mode]
    t0 = time.perf_counter()
    ref_predict.run_core(
        model_path=str(model_dir), config=None, input=str(fasta),
        output=str(out), fsize=FSIZE, stride=STRIDE, min_len=FSIZE,
        batch=BATCH, workers=4, mem=8, verbose=0,
        cpu=True, xla=False, onnx=False, int8=False, quantized=False,
        overwrite=True, getsequences=False, getalllabels=False,
        window_scores=False, save_embedding=False, save_nmd=False,
        prophage=m.get("prophage", False), sensitivity=0.5,
        plot_type=None,
        crf=m.get("crf", False), crf_prior="biological",
        crf_switch_cost=3.0, crf_transition_matrix=None,
        refine=m.get("refine", False), refine_mode="gated",
        refine_min_windows=2,
        refine_merge_split=False, refine_contig_hedge_margin=0.0,
        lc=None, pc=None, rc=None, dynamic_stride=False, dustmask=True,
    )
    return time.perf_counter() - t0


def run_ours(bundle: Path, fasta: Path, out: Path,
             precision: str = "float32", mode: str = "default") -> float:
    from jaeger_tpu.commands.predict import run_core

    m = MODES[mode]
    kw = {}
    if m.get("prophage"):
        kw.update(prophage=True, plot_type=None)
    if m.get("refine"):
        kw.update(refine=True)
    if m.get("crf"):
        kw.update(crf_switch_cost=3.0)
    if m.get("int8_auto"):
        from jaeger_tpu.models.conversion import quantize_bundle

        qdir = bundle.parent / (bundle.name + "_int8")
        if not (qdir / "params_int8.msgpack").exists():
            quantize_bundle(bundle, qdir, mode="full_int8")
        kw.update(int8_auto_path=str(qdir))
        precision = "bfloat16"  # int8 exec needs the bf16 program
    t0 = time.perf_counter()
    run_core(
        input_path=str(fasta), output_dir=str(out),
        model_path=str(bundle), fsize=FSIZE, stride=STRIDE,
        min_len=FSIZE, batch=BATCH, precision=precision, workers=4,
        overwrite=True, **kw,
    )
    return time.perf_counter() - t0


def count_windows(fasta: Path) -> int:
    """Window count under the fixed-stride contract (whole-contig pass
    for min_len<=len<fsize does not occur here: min_len==fsize)."""
    n = 0
    ln = 0
    for line in fasta.open():
        if line.startswith(">"):
            if ln >= FSIZE:
                n += max(1, (ln - FSIZE) // STRIDE + 1)
            ln = 0
        else:
            ln += len(line.strip())
    if ln >= FSIZE:
        n += max(1, (ln - FSIZE) // STRIDE + 1)
    return n


def host_ingest_rate(fasta: Path) -> float:
    """Our host pipeline alone (threaded windowing + per-window metadata,
    no device): windows/s."""
    from jaeger_tpu.seqops.windows import window_batches

    n = 0
    t0 = time.perf_counter()
    for wb in window_batches(str(fasta), fragsize=FSIZE, stride=STRIDE,
                             min_len=FSIZE, batch_capacity=BATCH,
                             workers=4):
        n += wb.bases.shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def device_rate(bundle: Path) -> float:
    """Device-path windows/s on the real chip (bench.py's device-resident
    measurement), run in a SUBPROCESS so the parent's CPU-forced JAX
    doesn't pin the platform."""
    import subprocess

    code = f"""
import json, time
import jax, jax.numpy as jnp
from jaeger_tpu.models.artifacts import load_model
model, variables, cfg, _ = load_model({str(bundle)!r}, dtype=jnp.bfloat16)
# load_model returns HOST numpy: without device_put every call re-uploads
# the 4.8 MB f32 param tree over the ~5 MB/s relay and the measurement
# reads ~2x low (measured: 9.7-15.2k vs 23.1k device-resident)
variables = jax.device_put(variables)
crop_nt = 3 * cfg["model"]["string_processor"]["crop_size"] + 5
batch, n_execs = 2048, 16
@jax.jit
def one_batch(variables, seed):
    bases = jax.random.randint(
        seed, (batch, crop_nt), 0, 4, dtype=jnp.int32).astype(jnp.uint8)
    lengths = jnp.full((batch,), crop_nt, jnp.int32)
    out = model.apply(variables, {{"bases": bases, "lengths": lengths}},
                      train=False, assume_dense=True)
    return jnp.sum(out["prediction"].astype(jnp.float32))
@jax.jit
def combine(accs):
    return jnp.sum(jnp.stack(accs))
# ONE fetch per measurement (bench.py's methodology): per-exec float()
# fetches pay ~30 ms relay RPC each and halve the apparent rate
_ = float(combine([one_batch(variables, jax.random.PRNGKey(0))]))
best = 0.0
for i in range(2):
    t0 = time.perf_counter()
    accs = [one_batch(variables, jax.random.PRNGKey(i * n_execs + j + 1))
            for j in range(n_execs)]
    _ = float(combine(accs))
    best = max(best, batch * n_execs / (time.perf_counter() - t0))
print("DEVICE_RATE", best)
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800, cwd=str(REPO))
    for line in out.stdout.splitlines():
        if line.startswith("DEVICE_RATE"):
            return float(line.split()[1])
    raise RuntimeError(f"device rate failed:\n{out.stdout}\n{out.stderr}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=20.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--repeat", type=int, default=1,
                    help="best-of-N wall-clock for each CPU pipeline")
    ap.add_argument("--chip", action="store_true",
                    help="also measure the device path on the real chip")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--full-surface", action="store_true",
                    help="also run the prophage/refine/crf modes "
                         "(both pipelines, per-mode contigs/s)")
    ap.add_argument("--modes", default="prophage,refine,crf",
                    help="comma list of full-surface modes to run")
    ap.add_argument("--skip-base", action="store_true",
                    help="reuse host-ingest/default rows (and any "
                         "already-measured modes) from an existing "
                         "--out artifact; run only the missing modes")
    ap.add_argument("--out", default=str(REPO / "E2E_BENCH.json"))
    ap.add_argument("--work", default="/tmp/e2e_bench")
    args = ap.parse_args()

    # force CPU BEFORE any jax-touching phase (weight conversion!) — the
    # axon sitecustomize registers the chip, and conversion over the
    # ~5 MB/s relay appears hung; the chip measurement runs in its own
    # subprocess (device_rate)
    import jax

    jax.config.update("jax_platforms", "cpu")

    work = Path(args.work)
    work.mkdir(parents=True, exist_ok=True)
    fasta = work / f"metagenome_{args.mb:g}mb_seed{args.seed}.fasta"
    if not fasta.exists():
        info = make_metagenome(fasta, args.mb, args.seed)
        (fasta.with_suffix(".json")).write_text(json.dumps(info))
    info = json.loads(fasta.with_suffix(".json").read_text())
    n_windows = count_windows(fasta)
    print(f"[data] {info['contigs']} contigs, {info['bases']:,} bp, "
          f"{n_windows} windows @ fsize={FSIZE}", flush=True)

    model_dir = work / "model"
    if not model_dir.exists() or not list(model_dir.glob("*_project.yaml")):
        build_flagship_artifact(work)
    bundle = work / "bundle"
    if not bundle.exists():
        convert_bundle(model_dir, bundle)

    prior = {}
    if args.skip_base and Path(args.out).exists():
        prior = json.loads(Path(args.out).read_text())
    results = prior if prior else {
        "metric": "end-to-end predict wall-clock: FASTA -> summary TSV",
        "dataset": {"contigs": info["contigs"], "bases": info["bases"],
                    "windows": n_windows, "fsize": FSIZE, "stride": STRIDE,
                    "seed": args.seed},
        "model": "flagship nmd_merge 6-class (reference zeus YAML, "
                 "reference-built weights, losslessly converted)",
        "runs": {},
    }

    # host ingest FIRST (clean process: measured after the ours-predict
    # runs it reads 7x lower — lingering engine/jax thread pools), then
    # ours, then the reference (its TF pools would pollute everything
    # after it). best-of-N walls: same-machine background noise moved a
    # single measurement by >2x across sessions; min is the standard
    # contention-robust statistic for wall-clock benches.
    if args.skip_base and "jaeger_tpu_cpu" in results.get("runs", {}):
        hi = results["runs"]["host_ingest_only"]["windows_per_s"]
        print(f"[skip-base] reusing base rows from {args.out}", flush=True)
    else:
        hi = max(host_ingest_rate(fasta) for _ in range(args.repeat))
    if not (args.skip_base and 'jaeger_tpu_cpu' in results.get('runs', {})):
        results["runs"]["host_ingest_only"] = {
            "windows_per_s": round(hi, 1),
            "note": f"threaded windowing+metadata, no model; best of "
                    f"{args.repeat}, measured before any model run",
        }
        print(f"[host ingest] {hi:.0f} windows/s", flush=True)

        ours_walls = [
            run_ours(bundle, fasta, work / "ours_out")
            for _ in range(args.repeat)
        ]
        t_ours = min(ours_walls)
        results["runs"]["jaeger_tpu_cpu"] = {
            "wall_s": round(t_ours, 2),
            "all_walls_s": [round(t, 2) for t in ours_walls],
            "contigs_per_s": round(info["contigs"] / t_ours, 2),
            "windows_per_s": round(n_windows / t_ours, 1),
            "note": "JAX CPU, float32, workers=4, full pipeline incl. "
                    f"termini scan + TSV write; best of {args.repeat}",
        }
        print(f"[ours/cpu] {t_ours:.1f}s = "
              f"{n_windows / t_ours:.0f} windows/s "
              f"(walls: {['%.1f' % t for t in ours_walls]})", flush=True)

        if not args.skip_ref:
            ref_walls = [
                run_reference(model_dir, fasta, work / "ref_out")
                for _ in range(args.repeat)
            ]
            t_ref = min(ref_walls)
            results["runs"]["reference_cpu"] = {
                "wall_s": round(t_ref, 2),
                "all_walls_s": [round(t, 2) for t in ref_walls],
                "contigs_per_s": round(info["contigs"] / t_ref, 2),
                "windows_per_s": round(n_windows / t_ref, 1),
                "note": "reference jaeger.commands.predict.run_core, TF CPU, "
                        "workers=4 (pyfastx/dust/parasail via byte-exact "
                        f"refstubs); best of {args.repeat}",
            }
            results["speedup_cpu_vs_reference"] = round(t_ref / t_ours, 2)
            results["variance_note"] = (
                "TF CPU wall-clock varies up to ~2.7x BETWEEN fresh "
                "processes on this shared machine (141-388 s observed for "
                "the reference across sessions; ours 72-91 s); the speedup "
                "is the same-process best-of-N A/B, the defensible "
                "like-for-like statistic."
            )
            print(f"[reference/cpu] {t_ref:.1f}s = "
                  f"{n_windows / t_ref:.0f} windows/s  "
                  f"(ours {t_ref / t_ours:.2f}x faster; "
                  f"walls: {['%.1f' % t for t in ref_walls]})", flush=True)

    if args.full_surface:
        # the full product surface (VERDICT r3 item 6): prophage path
        # (CPD + boundary snap + att-site SW), refinement (synthetic
        # calibration seeded into BOTH bundles so the path executes),
        # and CRF smoothing — contigs/s per mode, both pipelines,
        # same-process best-of-N
        seed_refine_calibrations(model_dir, bundle)
        results.setdefault("modes", {})
        for mode in [m for m in args.modes.split(",") if m]:
            if args.skip_base and mode in results["modes"] and \
                    "reference_error" not in results["modes"][mode]:
                print(f"[skip-base] mode {mode} already measured",
                      flush=True)
                continue
            row = {}
            walls = [run_ours(bundle, fasta, work / f"ours_{mode}",
                              mode=mode)
                     for _ in range(args.repeat)]
            row["jaeger_tpu_wall_s"] = round(min(walls), 2)
            row["jaeger_tpu_contigs_per_s"] = round(
                info["contigs"] / min(walls), 2)
            print(f"[ours/{mode}] {min(walls):.1f}s "
                  f"(walls {['%.1f' % t for t in walls]})", flush=True)
            if not args.skip_ref and not MODES[mode].get("ours_only"):
                try:
                    rwalls = [run_reference(model_dir, fasta,
                                            work / f"ref_{mode}",
                                            mode=mode)
                              for _ in range(args.repeat)]
                    row["reference_wall_s"] = round(min(rwalls), 2)
                    row["reference_contigs_per_s"] = round(
                        info["contigs"] / min(rwalls), 2)
                    row["speedup"] = round(min(rwalls) / min(walls), 2)
                    print(f"[ref/{mode}] {min(rwalls):.1f}s "
                          f"(ours {row['speedup']}x)", flush=True)
                except Exception as e:  # record, don't abort the bench
                    row["reference_error"] = f"{type(e).__name__}: {e}"
                    print(f"[ref/{mode}] FAILED: {e}", flush=True)
            results["modes"][mode] = row

    if args.chip:
        dr = device_rate(bundle)
        comp = min(hi, dr)
        results["runs"]["chip_composite"] = {
            "device_windows_per_s": round(dr, 1),
            "host_ingest_windows_per_s": round(hi, 1),
            "composite_windows_per_s": round(comp, 1),
            "note": "pipelined min(host, device); literal chip e2e would "
                    "measure the harness's ~5 MB/s relay, not the "
                    "hardware (CLAUDE.md)",
        }
        print(f"[chip] device {dr:.0f} w/s, composite {comp:.0f} w/s",
              flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps({"metric": results["metric"],
                      "out": args.out}), flush=True)


if __name__ == "__main__":
    main()
