"""Checkpoint garbage collection (toolkits/del_ckpt.sh:1-30): keep the newest
N checkpoints per run dir, optionally looping."""

from __future__ import annotations

import argparse
import time

from vits_tpu.utils.checkpoint import prune_checkpoints


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("dirs", nargs="+")
    parser.add_argument("--keep", "-k", type=int, default=5)
    parser.add_argument("--interval", "-i", type=int, default=0,
                        help="loop every N seconds (0 = run once)")
    args = parser.parse_args(argv)
    while True:
        for d in args.dirs:
            for regex in ("G_*.npz", "D_*.npz", "P_*.npz"):
                prune_checkpoints(d, keep=args.keep, regex=regex)
        if args.interval <= 0:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
