#!/usr/bin/env python
"""Public CLI: MV-VDM sampling (reference inference.py surface)."""

from animate3d_tpu.cli.inference import main

if __name__ == "__main__":
    main()
