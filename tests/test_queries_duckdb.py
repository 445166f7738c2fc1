"""Mimics the driver's correctness gate: run every REGISTRY query on Spark and
its oracle SQL on DuckDB at sf0.01; compare row count, column names, and the
order-insensitive multiset of values. ANCHOR_REGISTRY (oracle anchors folded
out of the <=50-entry driver window) is checked identically."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from complete_ocr_spark.queries import ANCHOR_REGISTRY, REGISTRY

ALL_CHECKED = {**REGISTRY, **ANCHOR_REGISTRY}

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, int):
        return int(v)
    return v


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def test_driver_registry_fits_correctness_window():
    assert len(REGISTRY) <= 50, (
        f"{len(REGISTRY)} registry entries; the driver checks only 50 — "
        "fold oracle anchors into ANCHOR_REGISTRY (round-3 verdict)"
    )


@pytest.mark.parametrize("name", sorted(ALL_CHECKED))
def test_query_matches_duckdb(spark, name):
    fn, sql = ALL_CHECKED[name]
    sdf = fn(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:  # rows-only check (non-SQL-expressible operator)
        assert len(s_rows) > 0
        return

    con = _duck()
    res = con.sql(sql)
    d_cols = [c.lower() for c in res.columns]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    assert len(s_rows) > 0, f"{name}: empty result — weak check, generate data with signal"
    cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")
