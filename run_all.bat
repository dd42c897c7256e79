@echo off
REM Full pipeline: data setup -> COUGHVID -> production training
REM (reference: run_all.bat). Windows twin of run_all.sh; assumes
REM dependencies are installed (see setup_windows.bat). Note: TPU
REM training hosts are Linux -- this launcher covers the CPU-backend
REM JAX path for Windows development machines.

echo === Step 1/4: download ESC-50 ===
python download_esc50.py
if errorlevel 1 goto :fail

echo === Step 2/4: COUGHVID + ESC-50 data setup ===
python -m cough_detector_tpu.cli.setup_coughvid --output-dir .\data
if errorlevel 1 goto :fail

echo === Step 3/4: train production (residual) model ===
python train_with_data.py .\data
if errorlevel 1 goto :fail

echo === Step 4/4: benchmark ===
python bench.py
if errorlevel 1 goto :fail

echo Done. Run: python run_detection.py --model .\checkpoints\best_model
goto :eof

:fail
echo Pipeline step failed (exit %errorlevel%).
exit /b 1
