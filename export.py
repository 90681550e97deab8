#!/usr/bin/env python3
"""CLI: export a training run to a deployable checkpoint (greedy-soup
averaging, optional speaker-embedding reset, optional AOT .jaxexp graphs).
Parity with the reference export.py entry."""
from vits_tpu.export import main

if __name__ == "__main__":
    main()
