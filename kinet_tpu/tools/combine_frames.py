"""Side-by-side frame composite (reference: src/combine_frames.py):
joins the same frame from two result-image directories into one image,
e.g. to compare two trackers' visualizations.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image


def combine(dir_a: str, dir_b: str, out_dir: str, axis: int = 1):
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(
        set(os.listdir(dir_a)) & set(os.listdir(dir_b))
    )
    for name in names:
        a = np.asarray(Image.open(osp.join(dir_a, name)))
        b = np.asarray(Image.open(osp.join(dir_b, name)))
        h = min(a.shape[0], b.shape[0])
        w = min(a.shape[1], b.shape[1])
        comp = np.concatenate([a[:h, :w], b[:h, :w]], axis=axis)
        Image.fromarray(comp).save(osp.join(out_dir, name))
    return len(names)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dir_a")
    p.add_argument("dir_b")
    p.add_argument("out_dir")
    p.add_argument("--axis", type=int, default=1)
    args = p.parse_args(argv)
    n = combine(args.dir_a, args.dir_b, args.out_dir, args.axis)
    print(f"combined {n} frames")


if __name__ == "__main__":
    main()
