#!/usr/bin/env python
"""Per-round deep soak entry point (r12 ADVICE #1).

The default pytest profile runs the hypothesis property file LEAN
(PROPERTY_EXAMPLES=4) and the snapshot fuzz model at its small default so
the full suite stays fast.  The documented "deep soak" was previously a
convention (export the env vars by hand); this script IS the convention,
so the deep profile actually runs each round:

    python tools/soak.py            # deep properties + snapshot fuzz
    python tools/soak.py -- -k properties   # extra pytest args after --

Sets PROPERTY_EXAMPLES=12, SNAPSHOT_FUZZ_OPS=14, SNAPSHOT_FUZZ_EXAMPLES=6
(the profile COVERAGE.md's round notes record) unless already set in the
environment, then execs pytest over the property + model files.
"""

from __future__ import annotations

import os
import sys

DEEP_PROFILE = {
    "PROPERTY_EXAMPLES": "12",
    "SNAPSHOT_FUZZ_OPS": "14",
    "SNAPSHOT_FUZZ_EXAMPLES": "6",
}

SOAK_FILES = [
    "tests/test_properties.py",
    "tests/test_snapshot_model.py",
]


def main() -> int:
    for k, v in DEEP_PROFILE.items():
        os.environ.setdefault(k, v)
    extra = sys.argv[1:]
    if extra and extra[0] == "--":
        extra = extra[1:]
    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    args = ["-q", *SOAK_FILES, *extra]
    print(
        "soak profile:",
        {k: os.environ[k] for k in DEEP_PROFILE},
        flush=True,
    )
    return pytest.main(args)


if __name__ == "__main__":
    sys.exit(main())
