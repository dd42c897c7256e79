@echo off
REM Environment check + native component probe (reference:
REM setup_windows.bat installed a venv + torch; here the requirements
REM are jax/flax/optax -- CPU backend on Windows; TPU hosts are Linux).
REM Installs python dependencies if missing, then verifies the package.

where python >nul 2>nul
if errorlevel 1 (
    echo Python not found on PATH. Install Python 3.10+ first.
    exit /b 1
)

echo === Installing python dependencies ===
python -m pip install -r requirements.txt
if errorlevel 1 (
    echo Dependency install failed.
    exit /b 1
)

echo === Checking python dependencies ===
python -c "import jax, flax, optax, numpy, orbax.checkpoint; print('jax', jax.__version__, '^| flax', flax.__version__, '^| optax', optax.__version__); print('devices:', jax.devices())"
if errorlevel 1 goto :fail

echo === Native components (optional; needs a C++ toolchain) ===
python -c "from cough_detector_tpu.data import native_loader; print('native loader:', 'OK' if native_loader.available() else 'unavailable (pure-python fallback active)')"
python -c "from cough_detector_tpu.serve import native_ingest; print('native serving plane:', 'OK' if native_ingest.available() else 'unavailable (python socket tier active)')"

echo === Audio backends (for live microphone mode) ===
python -c "from cough_detector_tpu.stream.mic import SOUNDDEVICE_AVAILABLE, PYAUDIO_AVAILABLE; print('sounddevice:', SOUNDDEVICE_AVAILABLE, '^| pyaudio:', PYAUDIO_AVAILABLE)"

echo Setup complete. Run: python -m pytest tests\ -q
goto :eof

:fail
echo Environment check failed.
exit /b 1
