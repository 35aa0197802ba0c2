#!/usr/bin/env python
"""CLI wrapper matching the reference's top-level novel_view.py."""
from animnerf_tpu.cli.novel_view import main

if __name__ == "__main__":
    main()
