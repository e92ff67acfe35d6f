"""Hypothesis property tests (SURVEY §5c): engine expressions vs the
reference formulas evaluated in pure Python on GENERATED inputs, one
Spark job per test (hypothesis drives the value lists, not the jobs).
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kenya_agricultural_regions_weather_etl_pipeline_spark.functions import weather as W

_spark = [None]


def _get_spark():
    # session-per-module (hypothesis examples reuse it)
    if _spark[0] is None:
        from kenya_agricultural_regions_weather_etl_pipeline_spark.session import get_spark

        _spark[0] = get_spark("kw-hypo", cpus="4")
    return _spark[0]


def _round_half_up(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s + 0.0


finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=10, deadline=None)
@given(st.lists(finite, min_size=1, max_size=50), st.integers(0, 6))
def test_round_half_up_matches_python(xs, n):
    spark = _get_spark()
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    got = [
        r.y
        for r in df.select(W.round_half_up(F.col("x"), n).alias("y"))
        .orderBy("x")
        .collect()
    ]
    want = [_round_half_up(x, n) for x in sorted(xs)]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-5, max_value=50, allow_nan=False),
            st.floats(min_value=0, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_heat_index_property(pairs):
    spark = _get_spark()
    df = spark.createDataFrame(pairs, "t double, h double")
    rows = df.select(
        "t", "h", W.heat_index(F.col("t"), F.col("h")).alias("hi")
    ).collect()
    for r in rows:
        if r.t < 27:
            assert r.hi == r.t
        else:
            poly = (
                -8.78469475556
                + 1.61139411 * r.t
                + 2.33854883889 * r.h
                + -0.14611605 * r.t * r.h
                + -0.012308094 * r.t * r.t
                + -0.0164248277778 * r.h * r.h
                + 0.002211732 * r.t * r.t * r.h
                + 0.00072546 * r.t * r.h * r.h
                + -0.000003582 * r.t * r.t * r.h * r.h
            )
            assert r.hi == _round_half_up(poly, 2)


# ---------------------------------------------------------------------------
# Media codec roundtrip properties (pure Python — no Spark session)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_arbitrary_samples(samples, rate):
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions import (
        codecs as C,
    )

    assert C.decode_wav(C.encode_wav(samples, rate)) == (rate, samples)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200
    ),
    st.data(),
)
@settings(max_examples=50, deadline=None)
def test_wav_slice_equals_python_slice(samples, data):
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions import (
        codecs as C,
    )

    s = data.draw(st.integers(min_value=0, max_value=len(samples)))
    e = data.draw(st.integers(min_value=s, max_value=len(samples)))
    raw = C.encode_wav(samples, 8000)
    assert C.decode_wav(C.slice_wav(raw, s, e))[1] == samples[s:e]


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.data(),
)
@settings(max_examples=30, deadline=None)
def test_bmp_roundtrip_arbitrary_pixels(w, h, data):
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions import (
        codecs as C,
    )

    px = st.tuples(
        st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
    )
    rows = data.draw(
        st.lists(
            st.lists(px, min_size=w, max_size=w), min_size=h, max_size=h
        )
    )
    got_w, got_h, got = C.decode_bmp(C.encode_bmp(w, h, rows))
    assert (got_w, got_h, got) == (w, h, rows)


@given(
    st.integers(min_value=2, max_value=12).filter(lambda v: v % 2 == 0),
    st.integers(min_value=2, max_value=8).filter(lambda v: v % 2 == 0),
    st.integers(min_value=1, max_value=5),
    st.data(),
)
@settings(max_examples=30, deadline=None)
def test_y4m_roundtrip_arbitrary_planes(w, h, n_frames, data):
    from kenya_agricultural_regions_weather_etl_pipeline_spark.functions import (
        codecs as C,
    )

    def plane(size):
        return st.binary(min_size=size, max_size=size)

    frames = data.draw(
        st.lists(
            st.tuples(
                plane(w * h), plane((w // 2) * (h // 2)), plane((w // 2) * (h // 2))
            ),
            min_size=n_frames,
            max_size=n_frames,
        )
    )
    got = C.decode_y4m(C.encode_y4m(w, h, frames))
    assert got == (w, h, 25, frames)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=6, max_size=40),
        min_size=4,
        max_size=12,
    )
)
def test_minhash_portable_pairs_are_true_near_dups(texts):
    """x2c soundness: every emitted (id_a, id_b, jaccard) must carry the
    EXACT shingle-set Jaccard of the two documents (recomputed in pure
    Python) and clear the threshold — LSH-then-verify means zero false
    positives by construction, whatever the corpus."""
    import re

    from kenya_agricultural_regions_weather_etl_pipeline_spark.operators.dedup import (
        minhash_portable_pairs,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = minhash_portable_pairs(
        df, k_shingle=2, n_hashes=16, n_bands=4, threshold=0.3
    ).collect()

    def sh_set(t: str) -> set:
        toks = [w for w in re.split(r"\s+", t.lower().strip()) if w]
        if not toks:
            return set()
        if len(toks) < 2:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    sets = {i: sh_set(t) for i, t in enumerate(texts)}
    for r in got:
        a, b = sets[r.id_a], sets[r.id_b]
        inter = len(a & b)
        want = inter / (len(a) + len(b) - inter)
        assert r.jaccard >= 0.3
        assert abs(r.jaccard - want) < 1e-6, (r, want)
