"""Pack a dataset pickle into the native loader's LNKS format.

The larger-than-HBM streaming path (``--packed-data`` on the stage CLIs,
data/native_loader.py + native/dataloader.cc) consumes a packed
little-endian float32 file. The stage CLIs pack on first use; this tool
does it explicitly — so a conversion can run once on a data node and the
training hosts only ever mmap — and doubles as an inspector.

Usage:
    links-pack --data h36m_data.pkl --out train2d.lnks            # pack
    links-pack --inspect train2d.lnks                             # header + stats
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from links_tpu.cli import _common as C


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Pack 2D training poses into a native LNKS file")
    parser.add_argument("--out", default=None, help="output .lnks path")
    parser.add_argument("--what", choices=["poses_2d", "poses_3d"],
                        default="poses_2d",
                        help="which normalized array to pack (train split)")
    parser.add_argument("--inspect", default=None, metavar="LNKS",
                        help="print header + row stats of an existing "
                             "packed file instead of packing")
    C.add_common_flags(parser)
    args = parser.parse_args(argv)

    from links_tpu.data import native_loader

    if args.inspect:
        ds = native_loader.PackedDataset(args.inspect)
        head = ds.gather(0, min(ds.n_rows, 1024))
        print(json.dumps({
            "path": args.inspect,
            "n_rows": ds.n_rows,
            "n_cols": ds.n_cols,
            "native": ds._h is not None,
            "head_mean": round(float(head.mean()), 6),
            "head_std": round(float(head.std()), 6),
        }))
        ds.close()
        return

    if not args.out:
        raise SystemExit("--out is required to pack (or use --inspect)")
    train_data = C.load_train(args)
    arr = np.asarray(getattr(train_data, args.what))
    native_loader.pack_dataset(args.out, arr)
    print(json.dumps({
        "out": args.out, "what": args.what,
        "n_rows": int(arr.shape[0]), "n_cols": int(arr.shape[1]),
        "native": native_loader.native_available(),
    }))


if __name__ == "__main__":
    main()
