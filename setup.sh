#!/usr/bin/env bash
# Environment setup: venv, editable install, native library build, model
# pre-download. Counterpart of reference setup.sh:1-75 (uv venv + model
# pre-download), adapted for a TPU host.
set -euo pipefail

PYTHON=${PYTHON:-python3}
VENV=${VENV:-.venv}

if [ ! -d "$VENV" ]; then
  echo "==> creating venv at $VENV"
  "$PYTHON" -m venv "$VENV"
fi
# shellcheck disable=SC1091
source "$VENV/bin/activate"

echo "==> installing package (editable) + extras"
pip install -q -e ".[server,hf,dev]" || pip install -q -e .

echo "==> building native host library (libfq3t.so)"
if command -v g++ >/dev/null; then
  make -C native
else
  echo "    g++ not found — skipping (numpy fallbacks will be used)"
fi

if [ "${PREDOWNLOAD:-0}" = "1" ]; then
  echo "==> pre-downloading model checkpoints"
  for m in Qwen/Qwen3-TTS-12Hz-0.6B-Base Qwen/Qwen3-TTS-12Hz-1.7B-Base; do
    python - <<EOF || echo "    (download of $m skipped — offline?)"
from huggingface_hub import snapshot_download
snapshot_download("$m")
EOF
  done
fi

echo "==> smoke test"
python -c "import faster_qwen3_tts_tpu as f; print('faster-qwen3-tts-tpu', f.__version__)"
echo "done."
