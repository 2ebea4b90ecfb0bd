#!/usr/bin/env python3
"""Benchmark harness entry point — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Thin wrapper over ekpnp.benchmark (also reachable as `python -m ekpnp
bench ...`).  See ekpnp/benchmark.py for modes (coupled | fluid | poisson)
and the roofline accounting.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ekpnp.benchmark import main

if __name__ == "__main__":
    sys.exit(main())
