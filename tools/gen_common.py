"""Shared plumbing for the six oracle generators (gen_*_oracle.py)."""

from __future__ import annotations

import sys


def reject_retired_sf_dir_arg() -> None:
    """The generators took an optional [sf_dir] argument until round 11;
    they now regenerate EXPECTED_BY_SF for every committed SF in one
    run, and a silently-ignored argument would surprise anyone following
    the old interface (or expecting a fourth SF to be included) — so
    refuse loudly instead."""
    if len(sys.argv) > 1:
        sys.exit(
            "this generator no longer takes an [sf_dir] argument - it "
            "regenerates EXPECTED_BY_SF for every committed SF in one run"
        )
