#!/usr/bin/env python
"""Generate the golden-image fixtures for tests/test_goldens.py.

Run from the repo root:  python tools/make_goldens.py

Renders each BASELINE config at a fixed seed / tiny resolution on the CPU
backend under EXACTLY the test environment (imports tests.conftest for the
platform + XLA flags), and writes float32 radiance arrays to
tests/goldens/<name>.npz.  Commit the outputs; the test suite then fails on
any frame change (SURVEY §4 implication (2): slow semantic drift is
otherwise unguarded — per-lane oracle parity is local and tolerance-based).

Regenerate ONLY when an intentional semantic change lands, and say so in the
commit that updates the goldens.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tests.conftest  # noqa: F401  (forces CPU backend + test XLA flags)

import numpy as np

from tests.test_goldens import GOLDEN_DIR, golden_configs, render_config


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in golden_configs():
        img = render_config(name)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, radiance=img.astype(np.float32))
        print(f"wrote {path}  shape={img.shape} mean={img.mean():.5f}")


if __name__ == "__main__":
    main()
