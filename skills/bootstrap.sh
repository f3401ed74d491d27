#!/usr/bin/env bash
# Bootstrap the Qwen3-ASR TPU skill: environment check, native build,
# model download, tokenizer generation.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
MODEL_ID="${ASR_MODEL_ID:-Qwen/Qwen3-ASR-0.6B}"
MODEL_DIR="${ASR_MODEL_DIR:-$REPO_DIR/models/$(basename "$MODEL_ID")}"

log() { echo "[bootstrap] $*" >&2; }

# ---------------------------------------------------------------- python env
log "checking python environment"
python - <<'EOF'
import importlib, sys
missing = [m for m in ("jax", "numpy", "safetensors", "tokenizers")
           if importlib.util.find_spec(m) is None]
if missing:
    sys.exit(f"missing python packages: {missing}")
import jax
print(f"[bootstrap] jax {jax.__version__}, backend: "
      f"{jax.default_backend()}, devices: {jax.devices()}", file=sys.stderr)
EOF

# ------------------------------------------------------------- audio decode
if command -v ffmpeg >/dev/null; then
    log "ffmpeg found: any audio container is decodable"
else
    log "WARNING: no ffmpeg on PATH — only WAV files will decode"
    log "         (install ffmpeg for mp3/flac/ogg/m4a support)"
fi

# ---------------------------------------------------------------- native lib
if command -v g++ >/dev/null && command -v make >/dev/null; then
    log "building native audio decoder"
    make -C "$REPO_DIR/native" >/dev/null
else
    log "g++/make not found; using pure-python audio path"
fi

# ------------------------------------------------------------- model weights
if [ -f "$MODEL_DIR/config.json" ]; then
    log "model already present at $MODEL_DIR"
elif command -v huggingface-cli >/dev/null; then
    log "downloading $MODEL_ID to $MODEL_DIR"
    huggingface-cli download "$MODEL_ID" --local-dir "$MODEL_DIR"
elif python -c "import huggingface_hub" 2>/dev/null; then
    log "downloading $MODEL_ID via huggingface_hub"
    python - "$MODEL_ID" "$MODEL_DIR" <<'EOF'
import sys
from huggingface_hub import snapshot_download
snapshot_download(sys.argv[1], local_dir=sys.argv[2])
EOF
else
    log "WARNING: no model at $MODEL_DIR and no download tool available."
    log "Place config.json + model.safetensors + tokenizer.json there manually."
fi

# ---------------------------------------------------------------- tokenizer
if [ -f "$MODEL_DIR/config.json" ] && [ ! -f "$MODEL_DIR/tokenizer.json" ]; then
    log "generating tokenizer.json via transformers"
    python - "$MODEL_DIR" <<'EOF'
import sys
from transformers import AutoTokenizer
d = sys.argv[1]
tok = AutoTokenizer.from_pretrained(d, trust_remote_code=True)
tok.backend_tokenizer.save(f"{d}/tokenizer.json")
EOF
fi

log "done. try:  python -m qwen3_asr_rs_tpu $MODEL_DIR <audio.wav>"
