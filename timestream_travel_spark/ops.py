"""Shared expression helpers for oracle-stable, scale-safe plans."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def ts_str(col: Column | str, alias: str | None = None) -> Column:
    """Format a timestamp to a second-precision string — the stable
    cross-engine output representation (FIXTURES.md oracle notes)."""
    c = F.date_format(F.col(col) if isinstance(col, str) else col, TS_FMT)
    return c.alias(alias) if alias else c


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact double-sum: accumulate as DECIMAL (associative, order-
    independent) then cast to double once. Double-precision SUM is
    order-dependent under Spark's partial aggregation, which breaks
    hash-comparison against any other engine; decimal accumulation
    sidesteps that without losing the double output type."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(20,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact-sum average: decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(20,{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB-side mirror of dsum().

    The DECIMAL→DOUBLE cast goes through VARCHAR: DuckDB's direct
    cast is not correctly rounded once the decimal exceeds double
    precision (measured: a 19-sig-digit Q19 revenue sum landed one
    ulp BELOW the correctly-rounded double that Spark's
    BigDecimal.doubleValue produces), while its VARCHAR→DOUBLE path
    (strtod) IS correctly rounded — making both engines agree
    bit-for-bit at any magnitude."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(20,{scale}))) AS VARCHAR)"
        f" AS DOUBLE) AS {alias}"
    )


def davg_sql(expr: str, alias: str, scale: int = 4) -> str:
    """Mirror of davg(); same VARCHAR bridge as dsum_sql."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(20,{scale}))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def revenue_col() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic.

    decimal(12,4) operands keep the product within precision 38, so
    neither engine rounds intermediates and the final double matches
    bit-for-bit."""
    price = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.lit(1).cast("decimal(12,4)") - F.col("l_discount").cast("decimal(12,4)")
    return price * disc


REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))"
)


def let_(expr: Column, body) -> Column:
    """Bind `expr` to a lambda variable and evaluate `body` against
    it ONCE per row — Spark's missing `let`. An outer expression
    captured inside a higher-order-function lambda is re-evaluated
    PER ELEMENT (no cross-lambda subexpression elimination), so e.g.
    shingling by slicing a captured regex-split costs O(len) splits
    per document. Wrapping the expensive expression in a one-element
    array and transforming it binds it to a NamedLambdaVariable,
    which the inner lambdas reference for free (measured 7× on
    char-8-gram shingles at sf0.1: 13.3 s → 1.9 s, identical
    results)."""
    return F.element_at(F.transform(F.array(expr), body), 1)
