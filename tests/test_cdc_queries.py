"""Oracle checks for the CDC pattern queries + smoke for demos."""

from __future__ import annotations

import pytest

from hcdc_spark.operators.cdc_queries import REG
from tests.conftest import assert_matches_oracle

SPECS = sorted(REG.specs.values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_cdc_query(spec, spark, oracle, sf_dir):
    if spec.name == "c16_editlog_decode":
        import os

        fixtures = os.environ.get(
            "HCDC_EDITLOG_FIXTURES",
            "/root/reference/change-manager/namenode-agent/src/test/"
            "resources/edits/logs",
        )
        if not os.path.isdir(fixtures):
            pytest.skip("edit-log binary fixtures not present")
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() > 0  # demos must produce rows
        return
    assert_matches_oracle(df, oracle, spec.oracle, spec.name)
