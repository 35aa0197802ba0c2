#!/usr/bin/env python
"""CLI wrapper matching the reference's top-level novel_pose.py."""
from animnerf_tpu.cli.novel_pose import main

if __name__ == "__main__":
    main()
