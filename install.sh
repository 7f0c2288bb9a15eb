#!/usr/bin/env bash
#
# One-liner install script for jaeger-tpu.
# Parity role: reference install.sh — platform detection + the right
# dependency extra. Here the accelerator axis is TPU / CPU / GPU via
# the JAX wheel variants instead of TF GPU builds.
#
# Usage: bash install.sh [--cpu|--tpu|--gpu] [--dev]

set -euo pipefail

RED='\033[0;31m'; GREEN='\033[0;32m'; BLUE='\033[0;34m'; NC='\033[0m'
info()  { printf "${BLUE}[INFO]${NC} %s\n" "$*"; }
ok()    { printf "${GREEN}[OK]${NC} %s\n" "$*"; }
err()   { printf "${RED}[ERR]${NC} %s\n" "$*" >&2; }

MODE="auto"
DEV=0
for arg in "$@"; do
  case "$arg" in
    --cpu) MODE="cpu" ;;
    --tpu) MODE="tpu" ;;
    --gpu) MODE="gpu" ;;
    --dev) DEV=1 ;;
    *) err "unknown flag: $arg"; exit 2 ;;
  esac
done

PY="${PYTHON:-python3}"
if ! "$PY" -c 'import sys; sys.exit(0 if (3,11) <= sys.version_info < (3,14) else 1)'; then
  err "jaeger-tpu requires Python 3.11-3.13"
  exit 1
fi

if [ "$MODE" = "auto" ]; then
  if [ -e /dev/accel0 ] || [ -d /sys/class/tpu ]; then
    MODE="tpu"
  elif command -v nvidia-smi >/dev/null 2>&1; then
    MODE="gpu"
  else
    MODE="cpu"
  fi
fi
info "installing for platform: $MODE"

case "$MODE" in
  tpu) JAX_SPEC='jax[tpu]' ;;
  gpu) JAX_SPEC='jax[cuda12]' ;;
  cpu) JAX_SPEC='jax' ;;
esac

"$PY" -m pip install --upgrade pip
"$PY" -m pip install "$JAX_SPEC"
if [ "$DEV" = 1 ]; then
  "$PY" -m pip install -e ".[plots]" pytest ruff
else
  "$PY" -m pip install "jaeger-tpu[plots]" 2>/dev/null \
    || "$PY" -m pip install ".[plots]"
fi

ok "installed; verifying with 'jaeger-tpu health'"
"$PY" -m jaeger_tpu.cli health || {
  err "health check failed - see output above"; exit 1;
}
ok "jaeger-tpu is ready"
