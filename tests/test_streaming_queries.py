"""Oracle checks for the driver-visible streaming queries.

These are the registry's streaming block (c04/c05/c09-c13): each runs a
real Structured Streaming query (availableNow) inside the operator and
returns the materialized result. Oracle-bearing specs hash-compare to
DuckDB; rows-only specs must still produce rows — their semantics are
gated separately in test_streaming.py / test_protobuf_codec.py.
"""

from __future__ import annotations

import pytest

from hcdc_spark.operators.streaming_queries import REG
from tests.conftest import assert_matches_oracle

SPECS = sorted(REG.specs.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_streaming_query(spec, spark, oracle, sf_dir):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() > 0
        return
    assert_matches_oracle(df, oracle, spec.oracle, spec.name)
