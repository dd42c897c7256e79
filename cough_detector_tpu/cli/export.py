"""Model export CLI — compiled-serving artifacts from any checkpoint.

The reference's only export is an (unwired) TorchScript trace
(reference: src/model.py:324-329). This exports, from an Orbax dir or .pt:
  --pt          reference-layout .pt (for reference tooling)
  --stablehlo   portable StableHLO text of the full serving program
  --fold-bn     fold BatchNorm into convs first (inference-only artifact)
"""

from __future__ import annotations

import argparse
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export a cough-detector model")
    p.add_argument("--model", type=str, required=True,
                   help="Checkpoint: Orbax dir or reference .pt")
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--pt", action="store_true", help="Write model.pt")
    p.add_argument("--stablehlo", action="store_true",
                   help="Write serving.stablehlo.txt")
    p.add_argument("--fold-bn", action="store_true")
    p.add_argument("--batch-size", type=int, default=256)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..models import model_from_config
    from ..models.export import export_stablehlo
    from ..models.fuse import fold_batchnorm
    from ..stream.detector import _load_any_checkpoint
    from ..train.checkpoint import export_torch_checkpoint

    variables, config = _load_any_checkpoint(args.model)
    if args.fold_bn:
        variables = fold_batchnorm(variables, config.model.model_type)
        print("BatchNorm folded into convolutions")

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    wrote = []

    if args.pt:
        path = out / "model.pt"
        export_torch_checkpoint(str(path), variables, config)
        wrote.append(str(path))

    if args.stablehlo:
        model = model_from_config(config.model)
        text = export_stablehlo(model, variables, config, args.batch_size)
        path = out / "serving.stablehlo.txt"
        path.write_text(text)
        wrote.append(str(path))

    if not wrote:
        raise SystemExit("Nothing to do: pass --pt and/or --stablehlo")
    for w in wrote:
        print(f"Wrote {w}")


if __name__ == "__main__":
    main()
