"""Regression guard for oracle result-type skew (round-7 ask #2).

DuckDB types a bare integer ``sum()`` as HUGEINT, which crosses Arrow as
``decimal128(38, 0)``; Spark's sum over a BIGINT column stays ``int64``.
The driver's correctness gate hashes *typed* values, so an oracle column
whose DuckDB type is HUGEINT hash-mismatches a value-identical Spark
result (rows ✓ / schema ✓ / hash ✗ — the exact r4–r6 red signature on
``profile_documents`` / ``iceberg_partitioned`` / the delta trio).

This test runs EVERY ``oracle_sql()`` entry through DuckDB at sf0.001
and fails if any result column materializes as a type Spark cannot
produce (HUGEINT/UHUGEINT → decimal128(38,0)/decimal128(39,0)).  Fix is
always the same one-liner in the oracle: ``CAST(sum(…) AS BIGINT)``.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TYPETEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


def _connect():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _is_spark_unrepresentable(typ: pa.DataType) -> bool:
    # HUGEINT -> decimal128(38,0); UHUGEINT -> decimal128(39,0) (or
    # decimal256). Spark sums of integral columns are int64; a DECIMAL
    # of scale 0 in an oracle is always an uncast integer aggregate.
    if pa.types.is_decimal(typ) and typ.scale == 0:
        return True
    return False


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_produces_spark_representable_types(name):
    sql = entrymod.oracle_sql()[name]
    con = _connect()
    try:
        tbl = con.execute(sql).arrow()
    finally:
        con.close()
    bad = [
        f"{f.name}: {f.type}"
        for f in tbl.schema
        if _is_spark_unrepresentable(f.type)
    ]
    assert not bad, (
        f"oracle '{name}' emits DuckDB HUGEINT-derived column(s) {bad}; "
        "wrap the integer aggregate in CAST(... AS BIGINT) so the typed "
        "value-hash matches Spark's int64"
    )
