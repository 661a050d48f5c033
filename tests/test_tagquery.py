"""P6 — OpenTSDB /api/query tag-filter semantics + /api/suggest.

Pins the filter compiler's per-type behavior on a handcrafted tag
fixture (including the cases the sf tables cannot exercise: literal
LIKE metacharacters in tag values, absent tags, full-match vs
substring regex), the groupBy-vs-aggregate split, and suggest's
prefix + max contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentsdb_rollup_rust_spark.operators.tagquery import (
    TagFilter,
    compile_tag_filter,
    suggest,
    tag_filter_rollup,
)


@pytest.fixture(scope="module")
def tagged(spark):
    """6 points, 4 distinct tag shapes. host 'web_1' and 'web%2' carry
    LIKE metacharacters on purpose; row f has NO host tag at all."""
    rows = [
        # (id, ts_sec, value, tags)
        ("a", 0, 10, {"host": "web1", "dc": "east"}),
        ("b", 0, 20, {"host": "web10", "dc": "west"}),
        ("c", 60, 30, {"host": "WEB1", "dc": "east"}),
        ("d", 60, 40, {"host": "web_1", "dc": "east"}),
        ("e", 120, 50, {"host": "web%2", "dc": "east"}),
        ("f", 120, 60, {"dc": "east"}),
    ]
    df = spark.createDataFrame(
        [(i, t, v, m) for i, t, v, m in rows],
        "id string, ts_sec long, value long, tags map<string,string>",
    )
    return df.select(
        "id", F.timestamp_seconds("ts_sec").alias("ts"), "value", "tags"
    ).cache()


def _ids(tagged, flt):
    pred = compile_tag_filter(F.col("tags"), flt)
    return {r.id for r in tagged.where(pred).select("id").collect()}


def test_literal_or(tagged):
    assert _ids(tagged, TagFilter("literal_or", "host", "web1|web10")) == {
        "a",
        "b",
    }


def test_iliteral_or_case_insensitive(tagged):
    assert _ids(tagged, TagFilter("iliteral_or", "host", "WEB1")) == {
        "a",
        "c",
    }


def test_not_literal_or_requires_tag_present(tagged):
    # f has no host tag: OpenTSDB filters only match series that HAVE
    # the tagk, so not_literal_or must exclude it too.
    got = _ids(tagged, TagFilter("not_literal_or", "host", "web1|WEB1"))
    assert got == {"b", "d", "e"}


def test_not_iliteral_or_case_insensitive(tagged):
    # case-insensitive exclusion, but still tag-present-only: f (no
    # host) stays out, and both 'web1' and 'WEB1' are excluded.
    got = _ids(tagged, TagFilter("not_iliteral_or", "host", "WEB1|web10"))
    assert got == {"d", "e"}


def test_not_key_matches_only_absent_tag(tagged):
    # not_key is the one absence filter: only f carries no host tag.
    assert _ids(tagged, TagFilter("not_key", "host", "")) == {"f"}


def test_not_key_refuses_value_and_group_by(tagged):
    with pytest.raises(ValueError, match="no filter value"):
        compile_tag_filter(F.col("tags"), TagFilter("not_key", "host", "x"))
    with pytest.raises(ValueError, match="groupBy"):
        compile_tag_filter(
            F.col("tags"), TagFilter("not_key", "host", "", group_by=True)
        )


def test_not_key_with_explicit_tags(tagged):
    """explicitTags + not_key: the absent key must not count toward
    the exact tag set. Filters (dc literal_or east, host not_key)
    under explicitTags match exactly the series whose tag set is
    {dc} — only f."""
    out = tag_filter_rollup(
        tagged,
        [
            TagFilter("literal_or", "dc", "east", group_by=True),
            TagFilter("not_key", "host", ""),
        ],
        60,
        explicit_tags=True,
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["dc"] == "east" and rows[0]["sum"] == 60


def test_wildcard_glob_and_case(tagged):
    # '*' is the only glob char; matching is case-SENSITIVE.
    assert _ids(tagged, TagFilter("wildcard", "host", "web1*")) == {"a", "b"}
    assert _ids(tagged, TagFilter("iwildcard", "host", "WEB1*")) == {
        "a",
        "b",
        "c",
    }


def test_wildcard_escapes_like_metacharacters(tagged):
    # literal '_' and '%' in the VALUE must not act as LIKE wildcards:
    # pattern 'web_1' matches only the host that is literally 'web_1'.
    assert _ids(tagged, TagFilter("wildcard", "host", "web_1")) == {"d"}
    assert _ids(tagged, TagFilter("wildcard", "host", "web%2")) == {"e"}


def test_regexp_full_match(tagged):
    # Java Pattern.matches semantics: 'web.' must NOT match 'web10'.
    assert _ids(tagged, TagFilter("regexp", "host", "web.")) == {"a"}
    assert _ids(tagged, TagFilter("regexp", "host", "web.*")) == {
        "a",
        "b",
        "d",
        "e",
    }


def test_unknown_filter_type_raises(tagged):
    with pytest.raises(ValueError):
        compile_tag_filter(F.col("tags"), TagFilter("nope", "host", "x"))


def test_group_by_split(tagged):
    """groupBy tags become dimensions; everything else aggregates.
    dc literal_or 'east' keeps a,c,d,e,f; grouping by dc collapses
    them into one (dc='east') row per window."""
    out = tag_filter_rollup(
        tagged,
        [TagFilter("literal_or", "dc", "east", group_by=True)],
        60,
    ).collect()
    got = {(r.dc, r.w_start): (r["sum"], r["count"]) for r in out}
    assert got == {
        ("east", 0): (10, 1),
        ("east", 60): (70, 2),
        ("east", 120): (110, 2),
    }


def test_no_group_by_tags_single_series(tagged):
    out = tag_filter_rollup(
        tagged, [TagFilter("wildcard", "host", "*")], 600
    ).collect()
    assert len(out) == 1
    assert (out[0]["sum"], out[0]["count"]) == (150, 5)
    assert out[0]["avg"] == 30.0


def test_suggest_prefix_limit_and_order(tagged):
    pts = tagged.withColumn("series_id", F.lit("m." + "x"))
    vals = [
        r.name for r in suggest(pts, "tagv", "web", limit=3).collect()
    ]
    # lexicographic ASCII ('%' < digits < '_'), WEB1 out (prefix is
    # case-sensitive), web_1 cut by the limit
    assert vals == ["web%2", "web1", "web10"]
    keys = [r.name for r in suggest(pts, "tagk", "", limit=25).collect()]
    assert keys == ["dc", "host"]
    mets = [r.name for r in suggest(pts, "metrics", "m.", limit=5).collect()]
    assert mets == ["m.x"]


def test_suggest_unknown_kind_raises(tagged):
    with pytest.raises(ValueError):
        suggest(tagged.withColumn("series_id", F.lit("m")), "bogus")


def test_explicit_tags_excludes_extra_tagged_series(spark):
    """P11: with explicitTags, a series matching every filter but
    carrying an extra tag is excluded; without, it is kept."""
    from opentsdb_rollup_rust_spark.operators.tagquery import (
        tag_filter_rollup,
    )

    rows = [
        ("a", 0, 1, {"host": "web1"}),
        ("b", 0, 2, {"host": "web1", "dc": "east"}),  # extra tag
    ]
    df = spark.createDataFrame(
        rows, "id string, ts_sec long, value long, tags map<string,string>"
    ).select(
        "id", F.timestamp_seconds("ts_sec").alias("ts"), "value", "tags"
    )
    flt = [TagFilter("wildcard", "host", "web*", group_by=True)]
    strict = tag_filter_rollup(df, flt, 60, explicit_tags=True).collect()
    assert len(strict) == 1 and strict[0]["sum"] == 1
    loose = tag_filter_rollup(df, flt, 60).collect()
    assert len(loose) == 1 and loose[0]["sum"] == 3
