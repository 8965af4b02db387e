"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship lifecycle at sf0.001 (documents -> pages
-> frozen text extraction -> address extraction -> geocode cascade -> S2
tiling). ``queries()`` exposes one entry per implemented operator family
from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for
every SQL-expressible one (hash-safe: integer/string output columns only).
The only queries registered without an oracle are the geocode lifecycle
pair — the distributed cascade (value-pinned instead by
test_flagship_output_pinned's sha256 of the complete sf0.001 output) and
the partition-local kernel (value-identical to the cascade by
tests/test_geocode_kernel.py). PIP,
ring-kNN, hex parents, n-gram Jaccard, lang-ID, the S2/H3 tile rollups,
SimHash and MinHash-LSH all run through the real operators with DuckDB
oracles — the non-SQL hash kernels (S2/H3 cells, SimHash signatures,
xxhash64 MinHash bands) are pinned as fixtures
(scripts/gen_cell_fixtures.py) while the surrounding join/rollup/band
semantics are recomputed in SQL against the live tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from nominatimwrapper_spark.plans import driver_queries as dq  # noqa: E402
from nominatimwrapper_spark.plans import flagship as fs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return fs.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational core (SQL-oracled)
        "top1_per_group": dq.q_top1_per_group,          # A1/W2
        "anti_join": dq.q_anti_join,                    # J3
        "broadcast_join_agg": dq.q_broadcast_join_agg,  # J1 + partial agg
        "left_join": dq.q_left_join,                    # J2
        "union_dedup": dq.q_union_dedup,                # U1/A5
        "coalesce_collapse": dq.q_coalesce_collapse,    # A6
        "value_counts": dq.q_value_counts,              # A3
        "asof_latest": dq.q_asof_latest,                # J11/W
        "postcode_score": dq.q_postcode_score,          # F10 when-chain
        "haversine": dq.q_haversine,                    # F14
        "grid_rollup": dq.q_grid_rollup,                # A9
        "grid_parent_rollup": dq.q_grid_parent_rollup,  # A9 zoom-out
        "hex_rollup": dq.q_hex_rollup,                  # A9 hex tiling
        "hex_parent_rollup": dq.q_hex_parent_rollup,    # F21 hex zoom-out
        "h3_rollup": dq.q_h3_rollup,                    # A9 real Uber-H3 res 9
        "h3_parent_rollup": dq.q_h3_parent_rollup,      # F21 H3 res-5 parents
        "knn_topk": dq.q_knn_topk,                      # J10/W4 oracle
        "knn_cells_grid": dq.q_knn_cells_grid,          # J10 scale path (oracled)
        "knn_h3": dq.q_knn_h3,                          # J10 on real H3 rings (oracled)
        "pip_rect": dq.q_pip_rect,                      # J9 (oracled)
        "pip_rect_h3": dq.q_pip_rect_h3,                # J9 on the H3 cover (oracled)
        "dedup_exact": dq.q_dedup_exact,                # dedup: exact
        "dedup_components": dq.q_dedup_components,      # dedup: CC closure
        "token_stats": dq.q_token_stats,                # text analysis
        "cosine_topk": dq.q_cosine_topk,                # similarity search
        "window_time_bucket": dq.q_window_time_bucket,  # streaming analog
        "range_join": dq.q_range_join,                  # interval join (BNLJ broadcast)
        # engine-native (rows-only)
        "geocode_flagship": fs.q_geocode_flagship,      # §3.4 lifecycle
        "geocode_kernel": fs.q_geocode_kernel,          # same lifecycle, one-stage kernel
        "s2_rollup": fs.q_s2_rollup,                    # F19/F21 + A9
        "lang_quality": fs.q_lang_quality,              # lang-ID + quality
        "simhash_near_dups": fs.q_simhash_near_dups,    # dedup: SimHash
        "minhash_lsh": fs.q_minhash_lsh,                # dedup: MinHash LSH
        "ngram_jaccard": fs.q_ngram_jaccard,            # dedup: n-gram (oracled)
    }


def oracle_sql() -> dict[str, str]:
    return {
        "top1_per_group": dq.SQL_TOP1,
        "anti_join": dq.SQL_ANTI,
        "broadcast_join_agg": dq.SQL_BJOIN,
        "left_join": dq.SQL_LJOIN,
        "union_dedup": dq.SQL_UNION,
        "coalesce_collapse": dq.SQL_COALESCE,
        "value_counts": dq.SQL_VCOUNTS,
        "asof_latest": dq.SQL_ASOF,
        "postcode_score": dq.SQL_PCSCORE,
        "haversine": dq.SQL_HAVERSINE,
        "grid_rollup": dq.SQL_GRID,
        "grid_parent_rollup": dq.SQL_GRID_PARENT,
        "hex_rollup": dq.SQL_HEX,
        "hex_parent_rollup": dq.SQL_HEX_PARENT,
        "h3_rollup": dq.SQL_H3,
        "h3_parent_rollup": dq.SQL_H3_PARENT,
        "s2_rollup": dq.SQL_S2_ROLLUP,
        "simhash_near_dups": dq.SQL_SIMHASH,
        "minhash_lsh": dq.SQL_MINHASH,
        "knn_topk": dq.SQL_KNN,
        "knn_cells_grid": dq.SQL_KNN_CELLS,
        "knn_h3": dq.SQL_KNN_CELLS,
        "pip_rect": dq.SQL_PIP_RECT,
        "pip_rect_h3": dq.SQL_PIP_RECT,
        "dedup_exact": dq.SQL_DEDUP,
        "dedup_components": dq.SQL_COMPONENTS,
        "token_stats": dq.SQL_TOKENS,
        "cosine_topk": dq.SQL_COSINE,
        "window_time_bucket": dq.SQL_WINDOW_BUCKET,
        "range_join": dq.SQL_RANGE_JOIN,
        "ngram_jaccard": dq.SQL_NGRAM_JACCARD,
        "lang_quality": dq.SQL_LANG_QUALITY,
    }
