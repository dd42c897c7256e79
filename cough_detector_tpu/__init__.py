"""cough_detector_tpu — a TPU-native real-time cough-detection framework.

A ground-up JAX/XLA/Pallas rebuild with the full capability surface of the
reference PyTorch pipeline (dataexplorations2026/cough_detector): audio
feature front end, three CNN classifier families, augmented training with
checkpoint/resume, batched offline featurization, and multi-stream sliding
-window serving — designed batch-first and device-resident for TPU.

Facade mirrors the reference package exports (reference: src/__init__.py)
plus the TPU-native additions (config schema, mesh utilities, streaming
engine).
"""

__version__ = "1.0.0"

from .config import Config, FeatureConfig, ModelConfig, StreamConfig, TrainConfig, default_config
from .models import (
    CoughDetector,
    CoughDetectorResidual,
    CoughDetectorSmall,
    count_parameters,
    create_model,
    init_model,
    predict,
)
from .ops import (
    extract_features,
    make_feature_fn,
    make_process_fn,
    process,
)
from .augment import augment_waveforms, mixup, spec_augment
from .preprocessing import (
    AudioPreprocessor,
    RealtimePreprocessor,
    create_preprocessor,
)
from .augmentation import (
    AudioAugmentor,
    MixUp,
    SpecAugment,
    create_augmentation_pipeline,
)

__all__ = [
    "Config",
    "FeatureConfig",
    "ModelConfig",
    "StreamConfig",
    "TrainConfig",
    "default_config",
    "CoughDetector",
    "CoughDetectorResidual",
    "CoughDetectorSmall",
    "count_parameters",
    "create_model",
    "init_model",
    "predict",
    "extract_features",
    "make_feature_fn",
    "make_process_fn",
    "process",
    "augment_waveforms",
    "mixup",
    "spec_augment",
    "AudioPreprocessor",
    "RealtimePreprocessor",
    "create_preprocessor",
    "AudioAugmentor",
    "MixUp",
    "SpecAugment",
    "create_augmentation_pipeline",
    "CoughDataset",
    "ESC50Dataset",
    "download_esc50",
]


def __getattr__(name):
    # Heavier subsystems load lazily so `import cough_detector_tpu` stays
    # light for serving-only or data-prep-only uses.
    if name in ("CoughDataset", "ESC50Dataset", "CombinedDataset", "BatchLoader",
                "create_data_loaders"):
        from .data import datasets

        return getattr(datasets, name)
    if name == "download_esc50":
        from .data.acquire import download_esc50 as _d

        return _d
    if name in ("StreamingDetector", "CoughDetectorInference",
                "RealtimeMicrophoneDetector", "list_audio_devices"):
        from . import stream

        return getattr(stream, name)
    if name == "train":
        from .train import train as _train

        return _train
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
