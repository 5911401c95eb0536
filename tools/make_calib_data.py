"""Convert .npy arrays (or a single stacked .npy) into the calibration
.bin layout the framework (and the reference) consume:
  input_dir/<input_name>/<idx>.bin  (raw float32)

Usage:
  python tools/make_calib_data.py --out calib_dir --name input stacked.npy
  python tools/make_calib_data.py --out calib_dir --name input dir_of_npys/
"""
import argparse
import os
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help=".npy file (N,...) or directory of per-sample .npy files")
    p.add_argument("--out", required=True)
    p.add_argument("--name", default="input", help="network input tensor name")
    args = p.parse_args()
    out_dir = os.path.join(args.out, args.name)
    os.makedirs(out_dir, exist_ok=True)
    if os.path.isdir(args.src):
        files = sorted(f for f in os.listdir(args.src) if f.endswith(".npy"))
        for i, f in enumerate(files):
            arr = np.load(os.path.join(args.src, f)).astype(np.float32)
            arr.tofile(os.path.join(out_dir, f"{i}.bin"))
        n = len(files)
    else:
        stack = np.load(args.src).astype(np.float32)
        for i in range(stack.shape[0]):
            stack[i].tofile(os.path.join(out_dir, f"{i}.bin"))
        n = stack.shape[0]
    print(f"wrote {n} samples to {out_dir}")


if __name__ == "__main__":
    main()
