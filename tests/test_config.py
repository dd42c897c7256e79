"""Config schema tests: geometry, flat-dict checkpoint compatibility, JSON."""

from cough_detector_tpu.config import (
    Config,
    FeatureConfig,
    default_config,
)


class TestGeometry:
    def test_shipped_geometry(self):
        cfg = FeatureConfig()
        assert cfg.segment_samples == 16000
        assert cfg.num_frames == 101
        assert cfg.num_features == 90
        assert cfg.feature_shape == (90, 101)

    def test_all_flags_geometry(self):
        cfg = FeatureConfig(
            use_pcen=True,
            use_pre_emphasis=True,
            use_delta_delta=True,
            use_spectral_contrast=True,
        )
        assert cfg.num_features == 110  # 64 + 13*3 + 7

    def test_mel_only_geometry(self):
        cfg = FeatureConfig(use_mfcc=False)
        assert cfg.num_features == 64


class TestFlatDict:
    def test_round_trip(self):
        cfg = default_config("residual")
        flat = cfg.to_flat_dict()
        # The exact keys the reference persists (reference: src/train.py:264-287).
        expected_keys = {
            "model_type", "sample_rate", "n_mels", "n_fft", "hop_length",
            "win_length", "f_min", "f_max", "segment_duration", "n_mfcc",
            "use_mfcc", "use_pcen", "use_pre_emphasis", "pre_emphasis_coef",
            "use_delta_delta", "use_spectral_contrast", "n_contrast_bands",
            "batch_size", "learning_rate", "weight_decay", "epochs",
            "patience",
        }
        assert set(flat) == expected_keys
        back = Config.from_flat_dict(flat)
        assert back.features == cfg.features
        assert back.model.model_type == "residual"

    def test_shipped_values(self):
        flat = default_config().to_flat_dict()
        assert flat["learning_rate"] == 0.0005
        assert flat["epochs"] == 150
        assert flat["patience"] == 20
        assert flat["use_pcen"] is False
        assert flat["use_mfcc"] is True

    def test_missing_keys_use_trained_defaults(self):
        # A checkpoint with a sparse config must reconstruct the *shipped*
        # geometry — not the reference's permissive all-ON fallback that
        # silently mis-shapes (reference: src/inference.py:129-143).
        cfg = Config.from_flat_dict({"model_type": "small"})
        assert cfg.features.num_features == 90
        assert cfg.model.model_type == "small"


class TestJson:
    def test_nested_round_trip(self):
        cfg = default_config("small")
        back = Config.from_json(cfg.to_json())
        assert back == cfg
