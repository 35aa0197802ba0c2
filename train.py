#!/usr/bin/env python
"""CLI wrapper matching the reference's top-level train.py."""
from animnerf_tpu.cli.train import main

if __name__ == "__main__":
    main()
