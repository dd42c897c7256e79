#!/usr/bin/env bash
# Environment check + native component build (reference: setup.sh installed
# a venv + torch; here jax/flax/optax are baked into the TPU image).
set -e

echo "=== Checking python dependencies ==="
python - <<'PY'
import jax, flax, optax, numpy
import orbax.checkpoint
print("jax", jax.__version__, "| flax", flax.__version__, "| optax", optax.__version__)
print("devices:", jax.devices())
PY

echo "=== Building native components (optional) ==="
python - <<'PY'
from cough_detector_tpu.data import native_loader
print("native loader:", "OK" if native_loader.available() else "unavailable (pure-python fallback active)")
from cough_detector_tpu.serve import native_ingest
print("native serving plane:", "OK" if native_ingest.available() else "unavailable (python socket tier active)")
PY

echo "=== Audio backends (for live microphone mode) ==="
python - <<'PY'
from cough_detector_tpu.stream.mic import SOUNDDEVICE_AVAILABLE, PYAUDIO_AVAILABLE
print("sounddevice:", SOUNDDEVICE_AVAILABLE, "| pyaudio:", PYAUDIO_AVAILABLE)
PY

echo "Setup complete. Run: python -m pytest tests/ -q"
