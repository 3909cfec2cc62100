"""Preprocess an h36m-fetch download into the reference pickle schema.

Reference: pre_process_h36m_fetch.py (walks processed/<subject>/<action>/
annot.h5, selects the 17-joint subset, pickles per-subject dicts). The
heavy lifting lives in links_tpu.data.preprocess (parity-tested against
real h5 fixtures in tests/test_data.py); this is the CLI wrapper the
README's real-data recipe invokes.

Usage:
    links-preprocess --h36m-dir <h36m-fetch root>/processed --out data/h36m_data.pkl
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="h36m-fetch processed/ tree -> reference-schema pickle")
    parser.add_argument("--h36m-dir", default="processed/",
                        help="h36m-fetch 'processed' directory "
                             "(subject/action/annot.h5 layout)")
    parser.add_argument("--out", default="data/h36m_data.pkl",
                        help="output pickle path")
    args = parser.parse_args(argv)

    from links_tpu.data.preprocess import preprocess_h36m_fetch

    d = preprocess_h36m_fetch(args.h36m_dir, args.out)
    for s in sorted(d):
        print(f"{s}: {d[s]['poses_2d'].shape[0]} frames")
    print(f"[links_tpu] wrote {args.out}")
    return d


if __name__ == "__main__":
    main()
