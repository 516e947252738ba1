#!/usr/bin/env python
"""Public CLI: MV-VDM trainer (reference train.py surface)."""

from animate3d_tpu.cli.train_mvvdm import main

if __name__ == "__main__":
    main()
