# -*- coding: utf-8 -*-
"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the plan — predicate pushdown + column pruning at the
scan, broadcast joins for the gazetteer, whole-stage codegen for Column
math (SURVEY.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _formatted(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_totalprice") > 100000.0)
        .select("o_orderkey", "o_totalprice")
    )
    plan = _formatted(df)
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice" in plan
    # column pruning: scan schema contains only the two needed columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_orderpriority" not in read_schema and "o_custkey" not in read_schema


def test_gazetteer_join_is_broadcast(spark, tmp_path_factory):
    from nominatimwrapper_spark.operators.geocode import (
        build_gazetteer_index,
        geocode_candidates,
    )
    from nominatimwrapper_spark.synth import gen_world, write_world

    d = tmp_path_factory.mktemp("plan_world")
    write_world(str(d), gen_world(n_streets=30, houses_per_street=4, n_pages=5, n_per_class=1))
    index = build_gazetteer_index(spark.read.parquet(f"{d}/gazetteer.parquet"))
    addr = spark.read.parquet(f"{d}/addresses.parquet").selectExpr(
        "referenceKey as addr_key", "streetName as street", "houseNumber as housenbr",
        "postCode as postcode", "postName as city", "countryName as country"
    ).withColumn("transformed_address", F.col("street"))
    cand = geocode_candidates(addr, index)
    plan = _formatted(cand)
    assert "BroadcastHashJoin" in plan
    # the big (address) side must never be broadcast: no SortMergeJoin needed
    # for the candidate lookup itself
    assert plan.count("BroadcastHashJoin") >= 4  # one per candidate level

    # the >broadcast-gate regime: with broadcast_ok=False (a several-GB
    # planet gazetteer) and the auto-broadcast threshold off, every
    # candidate join must compile to a shuffle join — no broadcast of
    # EITHER side (a planet gazetteer would OOM every executor)
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # threshold off BEFORE the index build: the cached lookup plan
        # (gazetteer self-join for parent variants) compiles under it too,
        # exactly as a >threshold planet gazetteer would plan itself
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # a fresh path: the cache manager dedups .cache() by logical plan,
        # so reusing the same parquet dir would hand back the FIRST index's
        # broadcast-compiled InMemoryRelation
        d2 = tmp_path_factory.mktemp("plan_world_nobc")
        write_world(str(d2), gen_world(n_streets=30, houses_per_street=4, n_pages=5, n_per_class=1))
        index_nobc = build_gazetteer_index(
            spark.read.parquet(f"{d2}/gazetteer.parquet"), broadcast_max_bytes=0
        )
        assert index_nobc.broadcast_ok is False
        plan_nobc = _formatted(geocode_candidates(addr, index_nobc))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    assert "BroadcastHashJoin" not in plan_nobc
    assert "SortMergeJoin" in plan_nobc


def test_column_math_stays_in_codegen(spark):
    from nominatimwrapper_spark.plans.driver_queries import q_haversine

    plan = _formatted(q_haversine(spark, SF))
    assert "codegen id" in plan  # whole-stage codegen spans (Spark 4 marker)
    # no Python UDF stage in a pure-Column query
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cascade_result_has_no_restore_join(spark, tmp_path_factory):
    """The original input row (caller columns included) is carried through
    the fan-back as a struct, so the cascade's final result must NOT contain
    a full-input restore join (at 100 TB that join — every input row
    reshuffled against every result row on addr_key — would be the job's
    largest shuffle)."""
    from nominatimwrapper_spark.operators.geocode import build_gazetteer_index, cascade
    from nominatimwrapper_spark.synth import gen_world, write_world

    d = tmp_path_factory.mktemp("norestore_world")
    write_world(str(d), gen_world(n_streets=30, houses_per_street=4, n_pages=5, n_per_class=1))
    index = build_gazetteer_index(spark.read.parquet(f"{d}/gazetteer.parquet"))
    addr = spark.read.parquet(f"{d}/addresses.parquet").selectExpr(
        "referenceKey as addr_key", "streetName as street", "houseNumber as housenbr",
        "postCode as postcode", "postName as city", "countryName as country"
    ).withColumn("caller_col", F.concat(F.lit("payload-"), F.col("addr_key")))
    res, _ = cascade(addr, index, with_rejected=False)
    plan = _formatted(res)
    # The fan-back join (keyed on transformed_address) may legitimately
    # appear as a shuffle join — at scale the unique-address side can be
    # too big to broadcast, and AQE converts it when it's small. What must
    # NOT exist is a join keyed on addr_key: that's the full-input restore
    # join the _orig payload struct replaces.
    import re

    assert not re.search(r"keys \[\d+\]: \[addr_key", plan), (
        "final cascade plan contains a join keyed on addr_key (restore join)"
    )
    # caller columns survive the cascade without the join
    out = res.select("addr_key", "caller_col").toPandas()
    assert (out["caller_col"] == "payload-" + out["addr_key"]).all()


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Tables bucketed on their join keys with the same bucket count join
    WITHOUT a shuffle: the plan must contain no Exchange on either side
    (the write-once-join-many pattern for 100 TB fact tables)."""
    from nominatimwrapper_spark.sources.bucketed import read_table, write_bucketed

    c = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey", "c_name")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_custkey")
    write_bucketed(c, "t_cust_b", "c_custkey", 8, path=str(tmp_path / "c"))
    write_bucketed(o, "t_ord_b", "o_custkey", 8, path=str(tmp_path / "o"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tables this small would be broadcast (also shuffle-free, but not
        # the path under test) — force the planner to the bucketed SMJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_table(spark, "t_cust_b").join(
            read_table(spark, "t_ord_b"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        plan = _formatted(j)
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # same rows as the plain (shuffling) join
        exp = c.join(o, c.c_custkey == o.o_custkey).count()
        assert j.count() == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_salted_rollup_two_phase(spark):
    from nominatimwrapper_spark.operators.spatial import tile_rollup

    pts = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        (F.col("c_custkey") % 50).alias("cell"),
        F.col("c_acctbal").alias("v"),
    )
    plan = _formatted(tile_rollup(pts, "cell", avg_cols=("v",), salt_partitions=8, salt_key="id"))
    # two-phase: two separate HashAggregate pairs (partial+final per phase)
    assert plan.count("HashAggregate") >= 4


def test_knn_target_join_respects_byte_gate(spark):
    """Round-3 verdict #2: kNN must not force-broadcast the target
    table. Below the byte gate the per-ring join is a BroadcastHashJoin;
    above it (or forced) the plan contains NO BroadcastExchange for the
    target side — a shuffle hash join on the cell key instead."""
    from nominatimwrapper_spark.operators.spatial import _knn_target_join

    t = spark.range(1000).selectExpr(
        "id as _tid", "cast(id as double)/100 as _tlat",
        "cast(id as double)/100 as _tlon", "id % 37 as _tcell"
    )
    shell = spark.range(200).selectExpr(
        "id as query_id", "cast(id as double)/50 as lat",
        "cast(id as double)/50 as lon", "id % 37 as _cell"
    )
    bc_plan = _formatted(_knn_target_join(shell, t, no_bc=False))
    assert "BroadcastHashJoin" in bc_plan
    nobc_plan = _formatted(_knn_target_join(shell, t, no_bc=True))
    assert "BroadcastExchange" not in nobc_plan
    assert "ShuffledHashJoin" in nobc_plan or "SortMergeJoin" in nobc_plan


def test_fused_cell_udf_single_arrow_crossing(spark):
    """Round-3 verdict #5: cell13 + h3_9 must cost ONE Python crossing.
    The fused struct UDF shows exactly one ArrowEvalPython node; the old
    two-UDF pattern showed two."""
    from nominatimwrapper_spark.functions import geo

    pts = spark.range(100).selectExpr(
        "cast(id as double)/10 as lat", "cast(id as double)/10 - 3 as lon"
    )
    cells = geo.s2_h3_cells_udf(13, 9)(F.col("lat"), F.col("lon"))
    df = (
        pts.withColumn("_cells", cells)
        .withColumn("cell13", F.col("_cells.s2"))
        .withColumn("h3_9", F.col("_cells.h3"))
        .drop("_cells")
    )
    plan = _formatted(df)
    # tree form "ArrowEvalPython (n)" — the detail section repeats the
    # node as "(n) ArrowEvalPython", so count tree nodes only
    assert plan.count("ArrowEvalPython (") == 1, plan
