"""Property-based checks of the round-5 operators: delta dedup must match
a pure-Python reference classification on arbitrary corpora, and the
temperature mixture must satisfy the majorization/limit laws of p^alpha
sampling on arbitrary language histograms."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xboard_spark.operators import dedup, sampling

# small text alphabet so hypothesis plants plenty of duplicate collisions
corpus_strategy = st.lists(
    st.tuples(
        st.text(alphabet="ab c", min_size=1, max_size=6),  # text
        st.sampled_from(["web", "wiki"]),                  # source
    ),
    min_size=1,
    max_size=16,
)


def _py_delta_dedup(rows, mod=5):
    """Pure-Python reference: same normalization, same precedence."""

    def norm(t):
        return " ".join(t.lower().split())

    base_fps = {
        norm(t) for i, (t, _) in enumerate(rows) if i % mod != 0
    }
    out = {}
    seen_in_batch = set()
    for i, (t, src) in enumerate(rows):
        if i % mod != 0:
            continue
        d = out.setdefault(
            src,
            {"n_incoming": 0, "dup_vs_base": 0, "dup_within": 0, "new": 0},
        )
        d["n_incoming"] += 1
        fp = norm(t)
        if fp in base_fps:
            d["dup_vs_base"] += 1
        elif fp in seen_in_batch:
            d["dup_within"] += 1
        else:
            d["new"] += 1
        # incoming docs are ranked by doc_id; enumeration order IS doc_id
        # order here, so first occurrence wins exactly like the window
        if fp not in base_fps:
            seen_in_batch.add(fp)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus_strategy)
def test_delta_dedup_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [
            (i, t, "en", src, len(t))
            for i, (t, src) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.source: r for r in dedup.delta_dedup_stats(df).collect()}
    want = _py_delta_dedup(rows)
    assert set(got) == set(want)
    for src, w in want.items():
        g = got[src]
        assert g.n_incoming == w["n_incoming"], (src, rows)
        assert g.n_dup_vs_base == w["dup_vs_base"], (src, rows)
        assert g.n_dup_within_batch == w["dup_within"], (src, rows)
        assert g.n_new_unique == w["new"], (src, rows)


hist_strategy = st.dictionaries(
    st.sampled_from(["en", "de", "fr", "es", "zh"]),
    st.integers(1, 500),
    min_size=2,
    max_size=5,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(hist_strategy)
def test_temperature_mixture_majorizes_toward_uniform(spark, hist):
    """p^alpha with alpha<1 always moves the distribution TOWARD uniform:
    every lang rarer than average gets factor >= 1, every lang more
    common than average gets factor <= 1, and the factor ordering is the
    reverse of the share ordering."""
    rows = []
    i = 0
    for lang, n in sorted(hist.items()):
        for _ in range(n):
            rows.append((i, f"doc {i}", lang, "web", 10))
            i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = sorted(
        sampling.temperature_mixture(df).collect(), key=lambda r: r.share
    )
    # distribution properties
    assert abs(sum(r.temp_share for r in out) - 1.0) < 1e-3
    # factor is antitone in share (rarer -> bigger up-weight); shares can
    # tie, so compare only strictly-ordered neighbors
    for a, b in zip(out, out[1:]):
        if a.share < b.share - 1e-9:
            assert a.sampling_factor >= b.sampling_factor - 1e-6, (a, b)
    # the rarest lang is never down-weighted below natural, the most
    # common never up-weighted above natural
    assert out[0].sampling_factor >= 1.0 - 1e-6
    assert out[-1].sampling_factor <= 1.0 + 1e-6
