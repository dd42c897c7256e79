"""Training CLI — flag-compatible with the reference trainer
(reference: src/train.py:521-568)."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train cough detection model")
    p.add_argument("--data-dir", type=str, default=None,
                   help="Directory with cough/non_cough subdirectories")
    p.add_argument("--output-dir", type=str, default="./checkpoints")
    p.add_argument("--model-type", type=str, default="small",
                   choices=["standard", "small", "residual"])
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--patience", type=int, default=15)
    p.add_argument("--device", type=str, default="auto",
                   help="Accepted for reference-CLI parity; JAX selects the backend")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--shards", type=str, default=None,
                   help="Train from a pre-decoded shard directory packed "
                        "by cdt-pack (no per-epoch decode; overrides "
                        "--data-dir / ESC-50 inputs)")
    p.add_argument("--no-device-corpus", action="store_true",
                   help="With --shards: stream batches from host instead "
                        "of uploading the corpus to HBM and running one "
                        "scanned XLA program per epoch "
                        "(= --device-corpus off)")
    p.add_argument("--device-corpus",
                   choices=["auto", "always", "chunked", "off"],
                   default="auto",
                   help="With --shards: 'auto' uploads the int16 corpus "
                        "once and scans whole epochs when it fits the "
                        "mesh HBM budget (row-sharding it past the "
                        "per-device budget), switching to 'chunked' "
                        "beyond the mesh total; 'chunked' forces the "
                        "double-buffered window-upload scan at any "
                        "size; 'always' demands the resident layout or "
                        "errors; 'off' streams per-batch from host")
    p.add_argument("--mixup", nargs="?", const=0.2, type=float, default=None,
                   metavar="ALPHA",
                   help="Enable feature-space MixUp with λ ~ Beta(α, α) "
                        "(default α 0.2). Off by default, matching the "
                        "reference (src/augmentation.py:334-369 defines "
                        "MixUp but never wires it into training)")
    p.add_argument("--no-esc50", action="store_true")
    p.add_argument("--esc50-dir", type=str, default=None)
    p.add_argument("--export-pt", action="store_true",
                   help="Also export best model in the reference .pt layout")
    p.add_argument("--distributed", action="store_true",
                   help="Join a multi-host JAX runtime (TPU pod slice) "
                        "before training; DP then spans all hosts' chips "
                        "with the same mesh code path")
    p.add_argument("--compile-cache", type=str, default=None,
                   help="Persistent XLA compile-cache directory: "
                        "restarted/resumed runs load the train programs "
                        "from disk instead of recompiling "
                        "(utils.enable_compile_cache)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    if args.distributed:
        # Must run before any JAX API initializes a backend.
        from ..parallel import maybe_initialize_distributed

        if not maybe_initialize_distributed():
            print("--distributed: no coordinator/pod environment found; "
                  "continuing single-host")

    if args.compile_cache:
        from ..utils import enable_compile_cache

        enable_compile_cache(args.compile_cache)

    from ..config import Config, ModelConfig, TrainConfig
    from ..data.acquire import download_esc50
    from ..train import train

    config = Config(
        model=ModelConfig(model_type=args.model_type),
        train=TrainConfig(
            batch_size=args.batch_size,
            learning_rate=args.lr,
            weight_decay=args.weight_decay,
            epochs=args.epochs,
            patience=args.patience,
            use_mixup=args.mixup is not None,
            mixup_alpha=args.mixup if args.mixup is not None else 0.2,
        ),
    )

    esc50_dir = args.esc50_dir
    use_esc50 = not args.no_esc50 and args.shards is None
    if use_esc50 and esc50_dir is None:
        import zipfile

        try:
            esc50_dir = download_esc50("./datasets")
        except (OSError, zipfile.BadZipFile) as e:
            # BadZipFile: captive portals / cut connections hand back an
            # HTTP-200 non-zip; that's a failed download too, not a bug.
            # Air-gapped trainers (TPU pods have no egress) shouldn't lose a
            # run over the optional auxiliary dataset — train on the custom
            # data if there is any. (The reference aborts here:
            # src/train.py:355 has no fallback.)
            if args.data_dir is None:
                raise
            print(f"ESC-50 download failed ({e}); training without it")
            use_esc50 = False

    best = train(
        data_dir=args.data_dir,
        output_dir=args.output_dir,
        config=config,
        use_esc50=use_esc50,
        esc50_dir=esc50_dir,
        resume=args.resume,
        num_workers=args.num_workers,
        shards_dir=args.shards,
        device_corpus=(
            False if (args.no_device_corpus or args.device_corpus == "off")
            else True if args.device_corpus == "always"
            else args.device_corpus
        ),
    )
    if args.export_pt:
        from pathlib import Path

        from ..train import checkpoint as ckpt

        if Path(best).exists():
            tree, epoch, metrics, cfg = ckpt.load_checkpoint(best)
            ckpt.export_torch_checkpoint(
                str(Path(args.output_dir) / "best_model.pt"),
                {"params": tree["params"], "batch_stats": tree["batch_stats"]},
                cfg, epoch, metrics,
            )
            print(f"Exported {args.output_dir}/best_model.pt")


if __name__ == "__main__":
    main()
