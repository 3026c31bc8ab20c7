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


def test_relational_oracle_invariants():
    """The c01-c04 relational folds are exact only under documented log
    shapes — fail here (not with a silent oracle divergence) if the
    generator ever changes."""
    from hcdc_spark.operators import cdc_oracle

    cdc_oracle.check_invariants(cdc_oracle.demo_events())
    cdc_oracle.check_invariants(cdc_oracle.stream_demo_events())


def test_relational_oracle_matches_golden_pins(oracle):
    """Triangle closure: the DuckDB relational re-derivations of the
    seed-42/seed-7 folds must equal the pinned golden rows (which the
    Spark pipelines are separately checked against) — three independent
    formulations (Python fold, window SQL, pins), one answer."""
    from hcdc_spark.operators import cdc_oracle, goldens

    for sql, rows in (
        (cdc_oracle.c01_oracle(), goldens.C01_ROWS),
        (cdc_oracle.c02_oracle(), goldens.C02_ROWS),
        (cdc_oracle.c03_oracle(), goldens.C03_ROWS),
        (cdc_oracle.c04_oracle(), goldens.C04_ROWS),
    ):
        got = sorted(tuple(r) for r in oracle.execute(sql).fetchall())
        assert got == sorted(tuple(r) for r in rows)
