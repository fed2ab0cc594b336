"""Generation-tagged backup chains: each increment lands its
manifest under _manifest/gen=N, the ledger reconstructs the chain's
watermark history, and restore_generation rebuilds the table EXACTLY
as the chain knew it after each increment (typed chain — JSON keeps
microseconds, so the generation boundary is value-exact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timestream_travel_spark.pipeline.backup import BackupConfig
from timestream_travel_spark.tables import load_table

_CUTS = ["2024-01-10 00:00:00", "2024-01-20 00:00:00", "2024-01-31 00:00:00"]
_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def test_generation_chain_ledger_and_time_travel(spark, sf_dir, tmp_path):
    from timestream_travel_spark.pipeline.generations import (
        backup_next_generation,
        chain_manifest,
        generation_ledger,
        restore_generation,
    )

    ev = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "chain")

    # three arrivals of the same stream: gen 0 full, gens 1..2 deltas
    gens = []
    for cut in _CUTS:
        cfg = BackupConfig(
            dest=dest,
            time_from="2024-01-01 00:00:00",
            time_to=cut,
            rows_per_chunk=500,
            faithful=False,  # typed: micros survive → exact travel
            tiebreak_col="event_id",
        )
        gens.append(backup_next_generation(spark, ev, cfg))
    assert gens == [0, 1, 2]

    ledger = {r["gen"]: r for r in generation_ledger(spark, dest).collect()}
    assert sorted(ledger) == [0, 1, 2]
    # watermarks strictly advance and rows partition the window
    assert ledger[0]["watermark_us"] < ledger[1]["watermark_us"] < ledger[2]["watermark_us"]
    # backup's window is INCLUSIVE on both ends (tables.time_window_filter)
    in_window = ev.filter(
        (F.col("ts") >= "2024-01-01 00:00:00") & (F.col("ts") <= _CUTS[-1])
    )
    assert sum(r["n_rows"] for r in ledger.values()) == in_window.count()
    # the chain manifest is the union of the generations
    assert chain_manifest(spark, dest).count() == sum(
        r["n_chunks"] for r in ledger.values()
    )

    # time travel: state after gen g == the source at gen g's window
    for g, cut in enumerate(_CUTS):
        out = str(tmp_path / f"asof_g{g}")
        res = restore_generation(spark, dest, out, g, schema=_SCHEMA)
        assert res["generation"] == g
        expected = ev.filter(
            (F.col("ts") >= "2024-01-01 00:00:00") & (F.col("ts") <= cut)
        )
        got = spark.read.parquet(out)
        assert res["rows_out"] == expected.count()
        assert sorted(r["event_id"] for r in got.select("event_id").collect()) == sorted(
            r["event_id"] for r in expected.select("event_id").collect()
        )

    with pytest.raises(ValueError, match="unknown generation"):
        restore_generation(spark, dest, str(tmp_path / "nope"), 9)


def test_generation_chain_cli(spark, sf_dir, tmp_path):
    from timestream_travel_spark.cli import main as cli_main

    dest = str(tmp_path / "chain")
    src = f"{sf_dir}/events.parquet"
    base = [
        "backup", "--source", src, "--dest", dest, "--chain", "--typed",
        "--tiebreak-col", "event_id", "--from", "2024-01-01 00:00:00",
    ]
    assert cli_main([*base, "--to", "2024-01-15 00:00:00"]) == 0
    assert cli_main([*base, "--to", "2024-01-31 00:00:00"]) == 0
    out = str(tmp_path / "asof0")
    assert (
        cli_main(
            ["restore", "--backup", dest, "--dest", out, "--generation", "0",
             "--schema", _SCHEMA]
        )
        == 0
    )
    ev = load_table(spark, sf_dir, "events")
    expected = ev.filter(
        (F.col("ts") >= "2024-01-01 00:00:00") & (F.col("ts") <= "2024-01-15 00:00:00")
    ).count()
    assert spark.read.parquet(out).count() == expected
    # unknown generation → exit code 2, not a traceback
    assert (
        cli_main(["restore", "--backup", dest, "--dest", out + "x", "--generation", "7"])
        == 2
    )


def test_chain_dry_run_and_mixed_manifest_guards(spark, sf_dir, tmp_path):
    """A dry-run chain backup must leave the ledger untouched (writing
    the manifest would advance the watermark past rows never
    exported); plain-vs-chain manifest mixing is refused both ways."""
    from timestream_travel_spark.cli import main as cli_main
    from timestream_travel_spark.pipeline.generations import (
        backup_next_generation,
        generation_ledger,
    )

    dest = str(tmp_path / "chain")
    src = f"{sf_dir}/events.parquet"
    base = [
        "backup", "--source", src, "--dest", dest, "--chain", "--typed",
        "--tiebreak-col", "event_id", "--from", "2024-01-01 00:00:00",
        "--to", "2024-01-15 00:00:00",
    ]
    # dry-run first: no ledger, no data
    assert cli_main([*base, "--dry-run"]) == 0
    assert generation_ledger(spark, dest).count() == 0
    # real run: gen 0 lands with everything the dry run previewed
    assert cli_main(base) == 0
    ledger = generation_ledger(spark, dest).collect()
    assert [r["gen"] for r in ledger] == [0]
    # a dry-run between increments also leaves the ledger alone
    assert cli_main([*base, "--dry-run"]) == 0
    assert generation_ledger(spark, dest).count() == 1

    # plain backup into a chain dest → refused, ledger survives
    assert (
        cli_main(
            ["backup", "--source", src, "--dest", dest, "--typed",
             "--from", "2024-01-01 00:00:00", "--to", "2024-01-31 00:00:00"]
        )
        == 2
    )
    assert [r["gen"] for r in generation_ledger(spark, dest).collect()] == [0]

    # chain into a plain-backup dest → clean ValueError, not a traceback
    plain = str(tmp_path / "plain")
    assert (
        cli_main(
            ["backup", "--source", src, "--dest", plain, "--typed",
             "--from", "2024-01-01 00:00:00", "--to", "2024-01-15 00:00:00"]
        )
        == 0
    )
    import pytest as _pytest

    from timestream_travel_spark.pipeline.backup import BackupConfig

    cfg = BackupConfig(dest=plain, time_from="2024-01-01 00:00:00",
                       time_to="2024-01-31 00:00:00", faithful=False,
                       tiebreak_col="event_id")
    with _pytest.raises(ValueError, match="not generation-tagged"):
        backup_next_generation(spark, spark.read.parquet(src), cfg)
