"""COUGHVID ingest CLI (reference: setup_coughvid.py:447-507).

Downloads COUGHVID from Zenodo, filters by annotation confidence, caps,
converts to 16 kHz mono wav, and merges ESC-50 coughs + hard negatives.
Unlike the reference, per-clip failures are quarantined with counts and the
data directory is only wiped on --wipe.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Set up COUGHVID training data")
    p.add_argument("--output-dir", type=str, default="./data")
    p.add_argument("--download-dir", type=str, default="./datasets")
    p.add_argument("--coughvid-dir", type=str, default=None,
                   help="Pre-downloaded COUGHVID directory (skips download)")
    p.add_argument("--max-coughs", type=int, default=3000)
    p.add_argument("--wipe", action="store_true",
                   help="Remove the output dir first (reference wipes always)")
    p.add_argument("--no-esc50", action="store_true")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import shutil
    from pathlib import Path

    from ..data import acquire

    out = Path(args.output_dir)
    if args.wipe and out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)

    coughvid = args.coughvid_dir or acquire.download_coughvid(args.download_dir)
    if coughvid and Path(coughvid).exists():
        acquire.prepare_coughvid(
            coughvid, args.output_dir, max_coughs=args.max_coughs
        )
    else:
        print("COUGHVID unavailable — continuing without it")

    if not args.no_esc50:
        esc50 = Path(args.download_dir) / "ESC-50-master"
        if not esc50.exists():
            try:
                esc50 = Path(acquire.download_esc50(args.download_dir))
            except Exception as e:
                print(f"ESC-50 download failed: {e}")
        if esc50.exists():
            n_c, n_n = acquire.reorganize_esc50(
                str(esc50), args.output_dir,
                # The COUGHVID merge casts the widest net: 17 negative
                # classes (reference: setup_coughvid.py:322-340).
                negatives=acquire.COUGHVID_MERGE_NEGATIVES,
            )
            print(f"ESC-50 merged: {n_c} coughs, {n_n} negatives")

    summary = acquire.dataset_summary(args.output_dir)
    print("=" * 50)
    print(f"cough: {summary['cough']}  non_cough: {summary['non_cough']}")
    print("Next: python train_with_data.py")


if __name__ == "__main__":
    main()
