#!/usr/bin/env python
"""CLI wrapper matching the reference's top-level extract_mesh.py."""
from animnerf_tpu.cli.extract_mesh import main

if __name__ == "__main__":
    main()
