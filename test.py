#!/usr/bin/env python
"""CLI wrapper matching the reference's top-level test.py."""
from animnerf_tpu.cli.test import main

if __name__ == "__main__":
    main()
