"""DuckDB oracle SQL builders, split into family blocks (round 6,
VERDICT r5 next-round item #7).

Each block exposes add(d, ns): ns is the __spark_entry__ module,
giving the moved code its original name scope through explicit
bindings; blocks run in the original assignment order so
cross-entry composition (d["x"] embedded in d["y"]) and alias
entries keep their semantics. Byte-identity with the pre-split
builder is pinned by tests/test_oracle_refactor.py."""

from . import b01, b02, b03, b04, b05, b06, b07, b08, b09, b10, b11, b12, b13, b14, b15, b16, b17, b18, b19, b20


def build(ns):
    d = {}
    for m in (b01, b02, b03, b04, b05, b06, b07, b08, b09, b10, b11, b12, b13, b14, b15, b16, b17, b18, b19, b20,):
        m.add(d, ns)
    return d
