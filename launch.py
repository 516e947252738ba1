#!/usr/bin/env python
"""Public CLI: 4D-stage experiment runner (reference launch.py surface:
--config <yaml> --train/--validate/--test/--export [dotted.overrides=...])."""

from animate3d_tpu.cli.launch import main

if __name__ == "__main__":
    main()
