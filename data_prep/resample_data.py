"""Offline dataset resampling (reference /root/reference/data_prep/resample_data.py).

Resamples every wav under ``data_dir`` into ``target_dir`` (tree
preserved) at ``target_sr`` using the first-party polyphase resampler —
no sox dependency.

Usage:
    python data_prep/resample_data.py <data_dir> <target_dir> <target_sr>
"""

import argparse

from aero_tpu.data.prep import resample_tree


def main():
    p = argparse.ArgumentParser()
    p.add_argument("data_dir")
    p.add_argument("target_dir")
    p.add_argument("target_sr", type=int)
    args = p.parse_args()
    resample_tree(args.data_dir, args.target_dir, args.target_sr)


if __name__ == "__main__":
    main()
