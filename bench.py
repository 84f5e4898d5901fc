#!/usr/bin/env python
"""Driver shim: run the packaged bench suite (mppi_tf_tpu/bench.py) with
artifacts (BENCH_SUITE.json, the jit cache) rooted at this checkout. The
same code ships as the `mppi-bench` console entry point."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("BENCH_DIR", _HERE)
sys.path.insert(0, _HERE)  # run from any cwd without installing

from mppi_tf_tpu.bench import main  # noqa: E402

if __name__ == "__main__":
    main()
