"""Structural contracts for the round-6 oracle-builder split.

The 5.6k-line inline ``oracle_sql()`` body became per-family block
modules under ``kenya_..._spark/oracles/`` (VERDICT r5 item #7). The
split was verified BYTE-IDENTICAL to the inline builder at extraction
time; these tests pin the properties that keep the composed builder
trustworthy as blocks evolve:

* blocks stay reviewable (hard line cap per module);
* blocks only ADD entries — a later block silently overwriting an
  earlier block's SQL would corrupt an oracle without any key-level
  signal (the full value-level safety net stays the DuckDB sweep in
  test_queries_oracle.py);
* the public ``oracle_sql()`` is exactly the composed build.

No Spark session needed — everything here is pure string assembly.
"""

from __future__ import annotations

import glob
import os

import __spark_entry__ as entrymod
from kenya_agricultural_regions_weather_etl_pipeline_spark import (
    oracles as ORC,
)

BLOCK_DIR = os.path.dirname(ORC.__file__)
MAX_BLOCK_LINES = 550


def test_blocks_stay_reviewable():
    oversize = {}
    for p in glob.glob(os.path.join(BLOCK_DIR, "b*.py")):
        n = sum(1 for _ in open(p))
        if n > MAX_BLOCK_LINES:
            oversize[os.path.basename(p)] = n
    assert not oversize, (
        f"oracle blocks grew past {MAX_BLOCK_LINES} lines: {oversize} — "
        "split the block instead of growing it"
    )


def test_blocks_never_overwrite_each_other():
    class Guard(dict):
        def __setitem__(self, k, v):
            assert k not in self, (
                f"oracle key {k!r} assigned by two blocks — the later "
                "one silently replaces the earlier SQL"
            )
            super().__setitem__(k, v)

        def update(self, other):  # d.update({...}) path in literal blocks
            for k, v in other.items():
                self[k] = v

    import re

    mods = [
        getattr(ORC, n) for n in dir(ORC) if re.fullmatch(r"b\d\d", n)
    ]
    d = Guard()
    for m in sorted(mods, key=lambda m: m.__name__):
        m.add(d, entrymod)
    assert d == entrymod.oracle_sql()  # guard saw every block, in order


def test_oracle_sql_is_the_composed_build():
    assert entrymod.oracle_sql() == ORC.build(entrymod)
