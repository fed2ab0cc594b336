from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs_and_has_stable_schema(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["partition", "chunk", "min_ts", "max_ts", "row_count"]
    for r in rows:
        assert r["min_ts"] <= r["max_ts"]
        assert r["row_count"] > 0


def test_every_query_has_callable_and_oracle_keys_match(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    # SQL-expressible coverage should stay high (rows-only is the
    # exception, not the rule)
    assert len(oracles) / len(qs) > 0.85
