"""Oracle-checked correctness for the relational query library."""

from __future__ import annotations

import pytest

from hcdc_spark.operators.analytics import REG

SPECS = sorted(REG.specs.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spec, spark, oracle, sf_dir):
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0
        return
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(df, oracle, spec.oracle, spec.name)
