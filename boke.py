#!/usr/bin/env python
"""Launcher for the bokego-tpu GTP engine (reference: boke.py)."""

from bokego_tpu.cli import main

if __name__ == "__main__":
    main()
