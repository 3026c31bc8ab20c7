"""Entity registry matching semantics (T7/T30)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hcdc_spark.cdc.registry import (
    DomainFilter,
    apply_registry,
    match_entity,
    matched_only,
)

RULES = [
    DomainFilter("test-domain-1", "MOVIES", "/test/hcdc/loader/parquet/movies",
                 r"(.*/*)(.*\.parquet)"),
    DomainFilter("test-domain-1", "LINKS", "/test/hcdc/loader/parquet/links",
                 r"(.*/*)(.*\.parquet)"),
    DomainFilter("d2", "CSV_ONLY", "/data/csv", r".*\.csv"),
]


def _match(spark, paths):
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    out = df.select(
        "path", match_entity(F.col("path"), RULES).alias("m")
    ).collect()
    return {r["path"]: (r["m"]["domain"], r["m"]["entity"]) if r["m"] else None
            for r in out}


def test_prefix_and_regex_match(spark):
    got = _match(spark, [
        "/test/hcdc/loader/parquet/movies/part-0001.parquet",
        "/test/hcdc/loader/parquet/movies/sub/dir/part-9.parquet",
        "/test/hcdc/loader/parquet/links/x.parquet",
        "/test/hcdc/loader/parquet/movies/readme.txt",
        "/test/hcdc/loader/parquet/other/x.parquet",
        "/data/csv/a.csv",
        "/data/csv/a.json",
    ])
    assert got["/test/hcdc/loader/parquet/movies/part-0001.parquet"] == (
        "test-domain-1", "MOVIES")
    assert got["/test/hcdc/loader/parquet/movies/sub/dir/part-9.parquet"] == (
        "test-domain-1", "MOVIES")
    assert got["/test/hcdc/loader/parquet/links/x.parquet"] == (
        "test-domain-1", "LINKS")
    assert got["/test/hcdc/loader/parquet/movies/readme.txt"] is None
    assert got["/test/hcdc/loader/parquet/other/x.parquet"] is None
    assert got["/data/csv/a.csv"] == ("d2", "CSV_ONLY")
    assert got["/data/csv/a.json"] is None


def test_global_ignore_regex(spark):
    got = _match(spark, [
        "/data/csv/a.csv._COPYING_",
        "/tmp/data/csv/a.csv",
        "/data/csv/x.hive-staging_123/a.csv",
    ])
    assert all(v is None for v in got.values())


def test_apply_registry_fills_columns(spark):
    from hcdc_spark.cdc.generator import events_df, generate_events

    rules = [DomainFilter("dom", "ENT", "/data/d0", r".*\.parquet")]
    events = events_df(spark, generate_events(n_files=20, seed=3,
                                              with_dir_ops=False))
    tagged = apply_registry(events, rules)
    m = matched_only(tagged)
    assert m.count() > 0
    assert m.where(~F.col("path").startswith("/data/d0/")).count() == 0
    assert tagged.where(F.col("domain").isNull()).count() > 0


def test_values_oracle_rendering():
    """The golden VALUES renderer must survive quotes, NULLs and
    booleans — a silent escaping bug here corrupts every golden
    oracle at once."""
    import duckdb

    from hcdc_spark.registry import values_oracle

    schema = [("s", "string"), ("n", "bigint"), ("b", "boolean"),
              ("i", "int"), ("d", "double")]
    rows = [
        ("it's a 'quoted' path", 9, True, 3, 1.5),
        (None, None, None, None, None),
    ]
    sql = values_oracle(schema, rows)
    con = duckdb.connect()  # hold the connection: rel is lazy
    rel = con.sql(sql)
    assert rel.columns == ["s", "n", "b", "i", "d"]
    got = rel.fetchall()
    assert got[0] == ("it's a 'quoted' path", 9, True, 3, 1.5)
    assert got[1] == (None, None, None, None, None)


def test_full_match_semantics(spark):
    """The reference matches with Matcher.matches() (whole string):
    a path merely CONTAINING /tmp/ must not be globally ignored, and a
    rule regex must not match a longer suffix (review r4 anchoring)."""
    got = _match(spark, [
        "/data/csv/nested/tmp/a.csv",          # contains /tmp/, not under it
        "/data/csv/a.csv.bak",                 # regex must not suffix-match
    ])
    # contains '/tmp/' but doesn't start with it -> NOT globally ignored,
    # and the suffix full-matches the rule regex -> legitimate match
    assert got["/data/csv/nested/tmp/a.csv"] == ("d2", "CSV_ONLY")
    assert got["/data/csv/a.csv.bak"] is None


def test_full_match_tmp_containing_path_still_matchable(spark):
    rules = [DomainFilter("d", "E", "/user/alice", r".*\.csv")]
    df = spark.createDataFrame(
        [("/user/alice/tmp/part.csv",), ("/tmp/alice/part.csv",)],
        "path string",
    )
    out = {
        r["path"]: r["m"]
        for r in df.select(
            "path", match_entity(F.col("path"), rules).alias("m")
        ).collect()
    }
    # contains '/tmp/' but does not START with it -> NOT globally ignored
    assert out["/user/alice/tmp/part.csv"] is not None
    # literally under /tmp/ -> ignored even if a rule matched
    assert out["/tmp/alice/part.csv"] is None
