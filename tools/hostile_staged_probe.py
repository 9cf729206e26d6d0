"""Double-hostile staged-op audit: the staged gate-readiness comparison
run with a HOSTILE SESSION TIMEZONE + 7-way parallelism.

Why this exists: pytest's session fixture uses get_spark, which pins the
session TZ to UTC -- so `pytest tests/test_staged_gate_readiness.py`
(even under TZ=Asia/Kolkata) never exercises the session-TZ axis that
the driver's vanilla session exposes. check_oracle has the
SPARK_GRAFT_SESSION_TZ hook, but only covers REGISTERED queries. This
probe closes the gap for staged ops BEFORE registration:

    TZ=Asia/Kolkata python tools/hostile_staged_probe.py

builds a Pacific/Chatham (+12:45) session at 7 shuffle partitions and
runs every batch + streaming staged case against its DuckDB twin
(values, columns, dtypes). Run it before any round's promotions.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from flink_training_exercises_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    tz = os.environ.get("SPARK_GRAFT_SESSION_TZ", "Pacific/Chatham")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "7"))
    spark = get_spark(
        "hostile_staged_probe",
        cpus=cpus,
        extra_conf={
            "spark.sql.session.timeZone": tz,
            "spark.sql.shuffle.partitions": str(cpus),
        },
    )
    print(f"session tz: {spark.conf.get('spark.sql.session.timeZone')}; "
          f"cpus/shuffle: {cpus}; system TZ: {os.environ.get('TZ', '(unset)')}")

    from tests.test_staged_gate_readiness import (
        _cases,
        compare_cases,
        streaming_cases,
    )

    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    cases = dict(_cases(spark, sf))
    cases.update(streaming_cases(spark, sf))
    failures = compare_cases(con, cases, verbose=True)
    if failures:
        print("\nFAILURES:")
        for f in failures:
            print(f"  {f}")
        return 1
    print("\nALL GREEN (double-hostile staged audit)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
