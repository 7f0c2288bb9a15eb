#!/usr/bin/env bash
# CLI smoke harness for jaeger-tpu.
#
# Role parity: reference test_cli/run_cli_tests.sh — run the real CLI
# against the bundled test FASTA with pass/fail/skip accounting.
# Env overrides:
#   JT_PYTHON     python interpreter (default: python)
#   JT_PLATFORM   JAX platform (default: cpu)
#   RUN_TRAIN     set 0 to skip the training smoke (default: 1)

set -u
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(dirname "$HERE")"
PY="${JT_PYTHON:-python}"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORMS="${JT_PLATFORM:-cpu}"

FASTA="$REPO/jaeger_tpu/data/test/test_contigs.fasta"
SHORT="$REPO/jaeger_tpu/data/test/test_short.fasta"
EMPTY="$REPO/jaeger_tpu/data/test/test_empty.fasta"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT
cd "$REPO"   # configs use repo-relative data paths

PASS=0; FAIL=0; SKIP=0
run() {
  local name="$1"; shift
  if "$@" >"$WORK/$name.log" 2>&1; then
    echo "[PASS] $name"; PASS=$((PASS+1))
  else
    echo "[FAIL] $name (see $WORK/$name.log)"; tail -5 "$WORK/$name.log"
    FAIL=$((FAIL+1))
  fi
}
skip() { echo "[SKIP] $1"; SKIP=$((SKIP+1)); }

cli() { "$PY" -m jaeger_tpu.cli "$@"; }

# --- basics ---
run help cli --help
run predict_help cli predict --help
run health cli health

# --- data utils ---
run fragment cli utils fragment -i "$FASTA" -o "$WORK/frags.csv" \
    --fsize 2000 --label 1
run mask cli utils mask -i "$SHORT" -o "$WORK/masked.fasta" \
    --maxperc 0.05
run split cli utils split -i "$FASTA" -o "$WORK/split.fasta" \
    --minlen 1000 --maxlen 2000
run ood_data cli utils ood-data -i "$WORK/frags.csv" -o "$WORK/ood.csv" \
    --method kmer --n-shuffles 1
run optimize_data cli utils optimize-data -i "$WORK/frags.csv" \
    -o "$WORK/frags.npz" --crop-size 104 --compress fast
run receptive_field cli utils receptive-field \
    -c "$REPO/tests/data/tiny_config.yaml"
run mask_tandem cli utils mask-tandem -i "$FASTA" \
    -o "$WORK/tandem_masked.fasta"
if [ -f "$REPO/jaeger_tpu/data/models/default/WRes_1024.h5" ]; then
  run convert_weights_h5 cli utils convert-weights \
      -i "$REPO/jaeger_tpu/data/models/default/WRes_1024.h5" \
      -o "$WORK/wres_conv" --family wres
else
  skip convert_weights_h5
fi

# --- train + predict round trip ---
if [ "${RUN_TRAIN:-1}" = "1" ]; then
  run train cli train -c "$REPO/tests/data/tiny_config.yaml" \
      -o "$WORK/model" --epochs 1 --steps-per-epoch 4
  if [ -f "$WORK/model/params.msgpack" ]; then
    run predict cli predict -i "$FASTA" -o "$WORK/out" -m "$WORK/model" \
        --min-len 500 --no-termini --batch 64
    run predict_crf cli predict -i "$FASTA" -o "$WORK/out_crf" \
        -m "$WORK/model" --min-len 500 --no-termini --crf-switch-cost 2.0
    # multi-host product path: two sequential shard runs + auto-merge
    run predict_mh0 cli predict -i "$FASTA" -o "$WORK/out_mh" \
        -m "$WORK/model" --min-len 500 --no-termini --batch 64 \
        --num-hosts 2 --host-id 0 --devices 1 --workers 2
    run predict_mh1 cli predict -i "$FASTA" -o "$WORK/out_mh" \
        -m "$WORK/model" --min-len 500 --no-termini --batch 64 \
        --num-hosts 2 --host-id 1 --devices 1 --workers 2
    run predict_mh_merged test -s \
        "$WORK/out_mh/test_contigs_default_jaeger.tsv"
    run stats cli utils stats \
        -i "$WORK/out/test_contigs_default_jaeger.tsv"
    run combine cli utils combine-models "$WORK/model" "$WORK/model" \
        -o "$WORK/ens" --method mean
    run predict_ensemble cli predict -i "$FASTA" -o "$WORK/out_ens" \
        -m "$WORK/ens" --min-len 500 --no-termini
    run register cli register-models "$WORK/model" \
        --registry "$WORK/registry.json"
    run list_models cli list-models --registry "$WORK/registry.json"
    # taxonomy round trip: index the test contigs, self-query them
    mkdir -p "$WORK/taxdump"
    printf '1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tsuperkingdom\t|\n3\t|\t2\t|\tspecies\t|\n' \
        > "$WORK/taxdump/nodes.dmp"
    printf '1\t|\troot\t|\t\t|\tscientific name\t|\n2\t|\tBacteria\t|\t\t|\tscientific name\t|\n3\t|\tE.coli\t|\t\t|\tscientific name\t|\n' \
        > "$WORK/taxdump/names.dmp"
    sed -n 's/^>\([^ ]*\).*/\1\t3/p' "$FASTA" > "$WORK/acc2taxid.tsv"
    run taxonomy_build cli taxonomy build -m "$WORK/model" -i "$FASTA" \
        --acc2taxid "$WORK/acc2taxid.tsv" --taxdump "$WORK/taxdump" \
        -o "$WORK/taxdb" --fsize 500 --batch 64
    run taxonomy_predict cli taxonomy predict -m "$WORK/model" \
        --db "$WORK/taxdb" -i "$FASTA" -o "$WORK/tax.tsv" \
        --fsize 500 --batch 64
    run taxonomy_nonempty test -s "$WORK/tax.tsv"
  else
    skip predict; skip predict_crf; skip stats; skip combine
  fi
else
  skip train; skip predict
fi

# --- error paths ---
if cli predict -i "$EMPTY" -o "$WORK/out_e" -m /nonexistent 2>/dev/null; then
  echo "[FAIL] empty_fasta_rejected (expected failure)"; FAIL=$((FAIL+1))
else
  echo "[PASS] empty_fasta_rejected"; PASS=$((PASS+1))
fi

echo
echo "passed=$PASS failed=$FAIL skipped=$SKIP"
[ "$FAIL" = "0" ]
