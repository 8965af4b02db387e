# -*- coding: utf-8 -*-
"""Geocode cascade — the in-cluster replacement for NominatimWrapper's
per-address REST pipeline.

Reference lifecycle being reproduced (values, not architecture):

    process_addresses            utils.py:1195-1279   -> cascade()
    transform_and_process        utils.py:589-688     -> _one_stage()
    apply_transformers           utils.py:692-776     -> apply_transformers()
    process_osm (REST + parse)   utils.py:300-441     -> _process()/_candidates_unique()
    osm_keep_relevant_results    check_result_utils.py:648-699 -> _score()/_pick_best()
    match_parent                 check_result_utils.py:560-644 -> _parent_rescue()
    retry_with_low_place_rank    utils.py:225-299     -> _retry_low_rank_unique()
    libpostal_transformer        transformers.py:261-320 -> rule-based parse UDF
    photon_transformer           transformers.py:182-247 -> locality-candidate rerank

Scale design: the gazetteer index is the SMALL side (a country extract is
millions of rows) and is broadcast; the page/address corpus is the BIG side
and never shuffles for the lookup itself. Candidate scoring happens after a
dropDuplicates on the composed address (the reference's only optimization,
utils.py:353-356 — here it is a partial-agg dedup). The per-stage loop
shrinks the working set with a left-anti join exactly like the reference's
`chunk[~isin(done)]` (utils.py:1263). Skewed hot streets are handled by
AQE skew-join on the fan-back join; the candidate join itself is broadcast
so skew cannot concentrate a shuffle partition.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ..functions.cleansing import (
    apply_regex_ruleset,
    collapse_map_col,
    collapse_set_col,
    compose_address_col,
    digit_prefix_col,
)
from ..functions.geo import haversine_col
from ..functions.similarity import (
    city_sim,
    elimination_rule,
    house_number_sim,
    postcode_sim,
    street_sim,
    street_sim_best,
)
from ..functions.textnorm import city_key, street_fingerprint_key

# reference config.py:102-112
# unique-address scoring parallelism: one task per this many distinct
# addresses (see _process). ~1k rows x <=50 candidates keeps a scoring task
# in the 0.5-1s range — fine-grained enough to spread real corpora over
# every core, coarse enough that micro-batch-sized inputs stay narrow.
_UQ_ROWS_PER_TASK = 1024

# fan-back join strategy gate (guide §3.1): keep_u holds at most one row per
# distinct composed address, so when the MEASURED unique count (already an
# action byproduct in _process) is below this, broadcasting it removes the
# full-input exchange+sort the planner otherwise schedules (keep_u is a
# checkpoint scan with no size stats, so auto-broadcast never fires at plan
# time and AQE's conversion lands only after the big side's shuffle is
# already written — measured 79 MB written + re-read per 2M-page stage).
# ~200k wide rows ≈ 150 MB broadcast; above that the shuffle join is right.
_FAN_BROADCAST_MAX_UNIQUES = 200_000

DEFAULT_TRANSFORMERS_SEQUENCE: list[list[str]] = [
    ["orig"],
    ["regex[init]"],
    ["libpostal", "regex[lpost]"],
    ["libpostal", "regex[lpost]", "photon"],
    ["nonum"],
    ["libpostal", "regex[lpost]", "nonum"],
    ["libpostal", "regex[lpost]", "photon", "nonum"],
    ["photon"],
    ["photon", "nonum"],
    ["nostreet"],
]

NOMINATIM_CANDIDATE_LIMIT = 50  # reference base.py:97

ADDR_COLS = ["addr_key", "street", "housenbr", "postcode", "city", "country"]


def _map_unique(s: pd.Series, fn) -> pd.Series:
    """fn over the batch's DISTINCT values only — street/city names repeat
    heavily (hot cities, shared gazetteer variants), so per-batch dedup
    cuts the normalize+fingerprint Python work by the repetition factor."""
    return s.map({v: fn(v) for v in s.unique()})


@pandas_udf(StringType())
def street_key_udf(s: pd.Series) -> pd.Series:
    return _map_unique(s, street_fingerprint_key)


@pandas_udf(StringType())
def city_key_udf(s: pd.Series) -> pd.Series:
    return _map_unique(s, city_key)


# ---------------------------------------------------------------------------
# gazetteer index
# ---------------------------------------------------------------------------


@dataclass
class GazetteerIndex:
    """Lookup-ready gazetteer. ``lookup`` has one row per (name-variant-part,
    place); ``places`` one row per place (for parent rescue)."""

    lookup: DataFrame
    places: DataFrame
    broadcast_ok: bool = True

    def hinted(self, df: DataFrame) -> DataFrame:
        return F.broadcast(df) if self.broadcast_ok else df


def build_gazetteer_index(
    gaz: DataFrame, broadcast_max_bytes: int = 800 * 1024 * 1024
) -> GazetteerIndex:
    """Build the join index from a gazetteer DataFrame
    (schema per FIXTURES.md §2; alt_names as map or array<struct<key,value>>).

    Every bilingual part of every name variant (street_name parts +
    alt_names values — the index the real Nominatim builds from its name
    table) becomes a lookup row keyed by letters-only fingerprint, so any
    language/spelling variant of a query street keys into the same places.

    Broadcast is gated on ESTIMATED BYTES (sampled avg row width x row
    count), not row count — 20M wide rows is several GB and OOMs executors
    if broadcast. Above ``broadcast_max_bytes`` the candidate joins fall
    back to shuffle joins on the fingerprint keys.
    """
    alt_t = dict(gaz.dtypes).get("alt_names", "")
    alt_map = F.col("alt_names") if alt_t.startswith("map") else F.map_from_entries("alt_names")

    base = gaz.withColumn("alt_map", alt_map).withColumn(
        "namedetails",
        F.when(
            F.col("category") == "highway",
            F.array_join(F.map_values(F.col("alt_map")), " - "),
        ).otherwise(F.lit("")),
    )

    # Output-field derivation. A nominatim-style dynamic ``address`` map
    # (road/pedestrian/town/village/... keys) collapses through
    # COLLAPSE_PARAMS exactly like the reference's add_addr_out_columns
    # (utils.py:559-579): priority fillna per output field, every unconsumed
    # value set-collapsed into out_other. Flat columns are the fallback for
    # pre-normalized gazetteers.
    if "address" in gaz.columns:
        addr_t = dict(gaz.dtypes).get("address", "")
        amap = F.col("address") if addr_t.startswith("map") else F.map_from_entries("address")
        o_street = collapse_map_col(amap, "street_name")
        o_post_name = collapse_map_col(amap, "post_name")
        o_house = collapse_map_col(amap, "house_number")
        o_pc = collapse_map_col(amap, "post_code")
        o_country = collapse_map_col(amap, "country_name")
        picked = [o_street, o_post_name, o_house, o_pc, o_country]
        base = (
            base.withColumn("_o_street", F.coalesce(o_street, F.col("street_name")))
            .withColumn("_o_post_name", F.coalesce(o_post_name, F.col("city")))
            .withColumn("_o_house", F.coalesce(o_house, F.col("house_number")))
            .withColumn("_o_pc", F.coalesce(o_pc, F.col("post_code")))
            .withColumn("_o_country", F.coalesce(o_country, F.col("country")))
            .withColumn("_o_other", collapse_set_col(F.map_values(amap), minus=picked))
        )
    else:
        base = (
            base.withColumn("_o_street", F.col("street_name"))
            .withColumn("_o_post_name", F.col("city"))
            .withColumn("_o_house", F.col("house_number"))
            .withColumn("_o_pc", F.col("post_code"))
            .withColumn("_o_country", F.col("country"))
            .withColumn("_o_other", F.lit(""))
        )

    places = base.select(
        "place_id", "parent_place_id", "street_name", "alt_map", "house_number",
        "post_code", "city", "country", "lat", "lon", "place_rank", "category",
        "importance", "namedetails",
    )

    # house rows inherit their parent street's name variants (incl. old
    # names) — Nominatim finds a house through any name of its street, which
    # is what makes the parent-rescue path reachable at all.
    empty_arr = F.array().cast("array<string>")
    parent_names = base.select(
        F.col("place_id").alias("_pp_id"), F.map_values("alt_map").alias("_p_variants")
    )
    with_parent = base.join(
        parent_names, base.parent_place_id == parent_names._pp_id, "left"
    ).drop("_pp_id")

    variants = with_parent.withColumn(
        "variant_part",
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.array_union(
                            F.array_union(
                                F.array(F.coalesce(F.col("street_name"), F.lit(""))),
                                F.coalesce(F.map_values("alt_map"), empty_arr),
                            ),
                            F.when(F.col("place_rank") == 30, F.coalesce(F.col("_p_variants"), empty_arr))
                            .otherwise(empty_arr),
                        ),
                        lambda v: F.split(v, " - "),
                    )
                )
            )
        ),
    ).drop("_p_variants")

    lookup = (
        variants.withColumn("key_street", street_key_udf(F.col("variant_part")))
        .withColumn("key_city", city_key_udf(F.col("city")))
        # empty-name parts only meaningful for city-level rows
        .filter((F.col("key_street") != "") | (F.col("place_rank") < 26))
        .select(
            "key_street", "key_city", "post_code", "house_number", "place_id",
            "parent_place_id", "place_rank", "category", "importance", "lat", "lon",
            F.coalesce("_o_street", F.lit("")).alias("out_street_name"),
            F.col("_o_post_name").alias("out_post_name"),
            F.col("_o_house").alias("out_house_number"),
            F.col("_o_pc").alias("out_post_code"),
            F.col("_o_country").alias("out_country_name"),
            F.col("_o_other").alias("out_other"),
            "namedetails",
        )
        .dropDuplicates(["key_street", "place_id"])
    )

    lookup = lookup.cache()
    n = lookup.count()
    est_bytes = n * _avg_row_bytes(lookup)
    return GazetteerIndex(
        lookup=lookup, places=places.cache(), broadcast_ok=est_bytes <= broadcast_max_bytes
    )


def _avg_row_bytes(df: DataFrame, sample_rows: int = 2000) -> int:
    """Average serialized row width from a small sample — JSON length is a
    (conservative, field-names-repeated) over-estimate of the broadcast
    relation's per-row cost."""
    # TABLESAMPLE over the whole table, not limit() — limit reads only the
    # first partition(s), which biases the estimate when row width correlates
    # with write order (e.g. gazetteer sorted by place_rank)
    row = (
        df.sample(fraction=0.01, seed=7)
        .limit(sample_rows)
        .select(F.length(F.to_json(F.struct(*df.columns))).alias("_w"))
        .agg(F.avg("_w").alias("w"))
        .first()
    )
    if row["w"] is None:  # tiny table: the 1% sample can be empty
        row = (
            df.limit(sample_rows)
            .select(F.length(F.to_json(F.struct(*df.columns))).alias("_w"))
            .agg(F.avg("_w").alias("w"))
            .first()
        )
    return int(row["w"] or 0) + 16  # + per-row object overhead


# ---------------------------------------------------------------------------
# candidate generation (the Nominatim-lookup analog)
# ---------------------------------------------------------------------------


def _unique_queries(addr: DataFrame) -> DataFrame:
    """Dedup on the composed address before the (expensive) lookup —
    reference utils.py:353-356. The same shuffle also counts how many input
    keys each distinct address carries (``_n_keys``): downstream control
    flow (matched-row counts, the everyone-matched short-circuit) then
    never needs an extra pass over the fanned input.

    Representative fields: when two different field splits compose to the
    same transformed_address (housenbr folded into street vs separate),
    ONE representative's fields drive the low-rank retry for all keys of
    that address. The reference's pre-lookup dropDuplicates is equally
    arbitrary (utils.py:353-356); we use min() so the pick is at least
    deterministic across runs/partitionings (documented parity edge)."""
    return (
        addr.select("transformed_address", "street", "housenbr", "postcode", "city", "country")
        .groupBy("transformed_address")
        .agg(
            *[F.min(c).alias(c) for c in ("street", "housenbr", "postcode", "city", "country")],
            F.count(F.lit(1)).alias("_n_keys"),
        )
        .withColumn("q_street_key", street_key_udf(F.col("street")))
        .withColumn("q_city_key", city_key_udf(F.col("city")))
        .withColumn("q_pc", F.coalesce(F.col("postcode"), F.lit("")))
        .withColumn("q_house", F.coalesce(F.col("housenbr"), F.lit("")))
    )


def _candidates_unique(q: DataFrame, index: GazetteerIndex) -> DataFrame:
    """Multi-level broadcast equi-join against the gazetteer — SURVEY.md J8 —
    at the UNIQUE-query level (one row per distinct composed address).
    Scoring/checking happens here too, so the expensive work is O(unique
    addresses), not O(pages); results fan back to page keys afterwards.

    Levels (lower wins for ordering; all levels unioned, capped at 50 like
    Nominatim's server-side limit, base.py:97):
      0: (street, postcode, house)  exact house rows
      1: (street, city, house)      house rows via city when postcode off
      2: (street, postcode)         street rows
      3: (street, city)             street rows
      4: (postcode)                 city rows   — only for empty street
      5: (city fingerprint)         city rows   — only for empty street
    """
    lk = index.hinted(index.lookup)

    has_street = q.filter(F.col("q_street_key") != "")
    no_street = q.filter(F.col("q_street_key") == "")

    houses = lk.filter(F.col("place_rank") == 30)
    streets = lk.filter(F.col("place_rank") == 26)
    cities = lk.filter(F.col("place_rank") < 26)

    def lvl(df: DataFrame, n: int) -> DataFrame:
        return df.withColumn("match_level", F.lit(n))

    c0 = lvl(
        has_street.filter(F.col("q_house") != "").join(
            houses,
            (F.col("q_street_key") == houses.key_street)
            & (F.col("q_pc") == houses.post_code)
            & (F.col("q_house") == houses.house_number),
        ),
        0,
    )
    c1 = lvl(
        has_street.filter((F.col("q_house") != "") & (F.col("q_city_key") != "")).join(
            houses,
            (F.col("q_street_key") == houses.key_street)
            & (F.col("q_city_key") == houses.key_city)
            & (F.col("q_house") == houses.house_number),
        ),
        1,
    )
    c2 = lvl(
        has_street.join(
            streets,
            (F.col("q_street_key") == streets.key_street)
            & (F.col("q_pc") == streets.post_code),
        ),
        2,
    )
    c3 = lvl(
        has_street.filter(F.col("q_city_key") != "").join(
            streets,
            (F.col("q_street_key") == streets.key_street)
            & (F.col("q_city_key") == streets.key_city),
        ),
        3,
    )
    c4 = lvl(
        no_street.filter(F.col("q_pc") != "").join(cities, F.col("q_pc") == cities.post_code),
        4,
    )
    c5 = lvl(
        no_street.filter(F.col("q_city_key") != "").join(
            cities, F.col("q_city_key") == cities.key_city
        ),
        5,
    )

    # most-specific-first, like Nominatim with a housenumber: when an exact
    # house hit exists for a query, street-level candidates are suppressed
    # (the house is the answer; if the checker rejects it, parent rescue —
    # not a vaguer street row — is the recovery path, as in the reference).
    house_cand = c0.unionByName(c1)
    house_hit = house_cand.select("transformed_address").distinct()
    street_cand = (
        c2.unionByName(c3).join(house_hit, on="transformed_address", how="left_anti")
    )
    cand = house_cand.unionByName(street_cand).unionByName(c4).unionByName(c5)

    # one row per (query, place): keep the best (lowest) match level
    per_place = Window.partitionBy("transformed_address", "place_id").orderBy("match_level")
    cand = cand.withColumn("_rn", F.row_number().over(per_place)).filter(F.col("_rn") == 1).drop("_rn")

    # deterministic result order per query = the reference's osm_order
    # (position in Nominatim's response, utils.py:489,529)
    order_w = Window.partitionBy("transformed_address").orderBy(
        F.col("match_level").asc(), F.col("importance").desc(), F.col("place_id").asc()
    )
    cand = (
        cand.withColumn("osm_order", F.row_number().over(order_w) - 1)
        .filter(F.col("osm_order") < NOMINATIM_CANDIDATE_LIMIT)
    )
    return cand.select(_CAND_COLS)


# candidate payload + the (transformed) query fields needed by the checker
_CAND_COLS = [
    "transformed_address", "street", "housenbr", "postcode", "city", "country",
    "place_id", "parent_place_id", "place_rank", "category",
    "lat", "lon", "osm_order", "out_street_name", "out_post_name",
    "out_house_number", "out_post_code", "out_country_name", "out_other", "namedetails",
]
_PAYLOAD_COLS = [c for c in _CAND_COLS if c not in ADDR_COLS[1:]]


def geocode_candidates(addr: DataFrame, index: GazetteerIndex) -> DataFrame:
    """Unique-level candidates fanned back to every input address key
    (reference utils.py:394)."""
    cand = _candidates_unique(_unique_queries(addr), index)
    return addr.select(ADDR_COLS + ["transformed_address"]).join(
        cand.select(_PAYLOAD_COLS), on="transformed_address", how="inner"
    )


# ---------------------------------------------------------------------------
# check path
# ---------------------------------------------------------------------------

_SIM_COLS = ["sim_street", "sim_street_which", "sim_house_number", "sim_post_code", "sim_city"]


def _score(cand: DataFrame, street_b: str = "street") -> DataFrame:
    """Attach the check scores — reference ignore_mismatch_keep_bests
    (check_result_utils.py:463-531). a-side = candidate output fields,
    b-side = the (transformed) input fields."""
    best = street_sim_best(
        F.col("out_street_name"), F.col("out_other"), F.col("namedetails"), F.col(street_b)
    )
    return (
        cand.withColumn("_sb", best)
        .withColumn("sim_street", F.col("_sb.sim_street"))
        .withColumn("sim_street_which", F.col("_sb.sim_street_which"))
        .drop("_sb")
        .withColumn(
            "sim_house_number",
            house_number_sim(F.coalesce("out_house_number", F.lit("")), F.coalesce("housenbr", F.lit(""))),
        )
        .withColumn(
            "sim_post_code",
            postcode_sim(F.coalesce("out_post_code", F.lit("")), F.coalesce("postcode", F.lit(""))),
        )
        .withColumn(
            "sim_city",
            city_sim(F.coalesce("out_post_name", F.lit("")), F.coalesce("city", F.lit(""))),
        )
    )


def _pick_best(
    scored: DataFrame, max_res: int = 1, key: str = "addr_key"
) -> tuple[DataFrame, DataFrame]:
    """Split keep/reject: elimination rule, then best-per-key window
    (check_result_utils.py:532-554). ``key`` is addr_key when scoring fanned
    rows, transformed_address when scoring at the unique-query level."""
    elim = elimination_rule(F.col("sim_post_code"), F.col("sim_city"), F.col("sim_street"))
    # eager materialization: half a dozen downstream actions (parent rescue,
    # retry guards, keep/tail splits) would otherwise re-run the pandas-UDF
    # scoring pipeline each time
    scored = scored.withColumn("_elim", elim).localCheckpoint(eager=True)

    mismatch = scored.filter(F.col("_elim")).withColumn("reject_reason", F.lit("mismatch"))

    w = Window.partitionBy(key).orderBy(
        F.col("sim_street").desc(), F.col("sim_house_number").desc(), F.col("osm_order").asc()
    )
    ranked = scored.filter(~F.col("_elim")).withColumn("_rank", F.row_number().over(w))
    keep = ranked.filter(F.col("_rank") <= max_res).drop("_rank")
    tail = ranked.filter(F.col("_rank") > max_res).drop("_rank").withColumn(
        "reject_reason", F.lit("tail")
    )
    reject = mismatch.unionByName(tail, allowMissingColumns=True)
    return keep.drop("_elim"), reject.drop("_elim")


def _parent_rescue(
    keep: DataFrame, reject: DataFrame, index: GazetteerIndex, key: str = "addr_key"
) -> tuple[DataFrame, DataFrame]:
    """Alt-name rescue through the parent place — reference match_parent
    (check_result_utils.py:560-644), as a broadcast self-join instead of
    two REST round-trips per rejected row."""
    final_rejected = (
        reject.filter(F.col("reject_reason") == "mismatch")
        .join(keep.select(key).distinct(), on=key, how="left_anti")
        .drop("reject_reason", *_SIM_COLS)
    )

    parents = index.hinted(
        index.places.select(
            F.col("place_id").alias("p_pid"),
            F.col("category").alias("p_cat"),
            F.col("alt_map").alias("p_alt"),
        )
    )
    alt = (
        final_rejected.join(parents, final_rejected.parent_place_id == parents.p_pid, "inner")
        .filter(F.col("p_cat") == "highway")  # street parents only (ref :603)
        .select("*", F.explode(F.col("p_alt")).alias("alt_lang", "alt_name"))
        .drop("p_pid", "p_cat", "p_alt")
        .filter(F.col("alt_name") != F.col("out_street_name"))  # ref :617
    )
    if alt.isEmpty():
        return keep, reject

    # re-check with the alt name as the only street field (ref :622-630)
    alt = (
        alt.withColumn("_s", street_sim(F.coalesce("alt_name", F.lit("")), F.coalesce("street", F.lit(""))))
        .withColumn("sim_street", F.col("_s"))
        .withColumn("sim_street_which", F.lit("alt_names"))
        .drop("_s")
        .withColumn(
            "sim_house_number",
            house_number_sim(F.coalesce("out_house_number", F.lit("")), F.coalesce("housenbr", F.lit(""))),
        )
        .withColumn(
            "sim_post_code",
            postcode_sim(F.coalesce("out_post_code", F.lit("")), F.coalesce("postcode", F.lit(""))),
        )
        .withColumn(
            "sim_city",
            city_sim(F.coalesce("out_post_name", F.lit("")), F.coalesce("city", F.lit(""))),
        )
        .drop("alt_lang")
    )
    saved, _ = _pick_best(alt.drop("alt_name"), key=key)
    if saved.isEmpty():
        return keep, reject

    keep2 = keep.unionByName(saved, allowMissingColumns=True)
    # drop rescued (key, place_id) pairs from the reject pile (ref :636)
    reject2 = reject.join(
        saved.select(key, "place_id").distinct(), on=[key, "place_id"], how="left_anti"
    )
    return keep2, reject2


# ---------------------------------------------------------------------------
# single lookup+check pass, low-rank retry, one transformer stage
# ---------------------------------------------------------------------------


def _process(
    addr: DataFrame,
    index: GazetteerIndex,
    check_results: bool,
    use_parent: bool = True,
    with_retry: bool = False,
    with_counts: bool = True,
) -> tuple[DataFrame, DataFrame, int | None, DataFrame | None]:
    """process_osm analog (utils.py:300-441): candidates -> check / first.

    The entire check (scoring UDFs, elimination, best-per-address window,
    parent rescue, AND the low-rank retry) runs at the UNIQUE-composed-
    address level — O(distinct addresses), the reference's own dedup
    optimization (utils.py:353-356) extended through the checker. Only the
    final keep/reject fan back to page keys — ONE pass over the input per
    stage; no control-flow action ever touches the fanned frame. Outcomes
    are identical because every key of one composed address shares the same
    candidates, scores, and verdicts.

    Returns (keep, reject, n_keep, unmatched): n_keep is the fanned keep
    row count via unique-level multiplicities; unmatched (when the input
    carries _orig) is the rebuilt not-matched todo set — both byproducts
    the cascade loop uses instead of re-scanning the fan.
    """
    uq = _unique_queries(addr)
    # TINY (one row per distinct composed address) but its plan is a full
    # dedup pass over the input: eager-materialize so the six candidate
    # levels and every scoring/rescue/retry action read the materialized
    # rows instead of re-triggering the 2M-row dedup whenever exchange
    # reuse doesn't apply (the pandas-UDF key projections sit between the
    # branches and the shared shuffle)
    uq = uq.localCheckpoint(eager=True)
    # Width by ROW COUNT, not bytes (AQE's metric) and not blanket
    # defaultParallelism: scoring cost is CPU-per-row, so a big unique set
    # must spread across the cluster — but a small one (micro-batches, the
    # steady-state cascade tail) fanned to 32 partitions pays ~6 candidate
    # branches x pandas-UDF key projections x tasks in pure Python-worker
    # round-trips, which measured 2-4x slower than a narrow plan at ~700
    # uniques. One partition per _UQ_ROWS_PER_TASK rows, capped at cluster
    # parallelism: large inputs behave exactly as before, small ones run
    # narrow. The count is a cheap scan of the just-materialized rows.
    par = addr.sparkSession.sparkContext.defaultParallelism
    n_uq = uq.count()
    width = max(1, min(par, -(-n_uq // _UQ_ROWS_PER_TASK)))
    have = uq.rdd.getNumPartitions()
    if have < width:
        uq = uq.repartition(width)
    elif have > width:
        uq = uq.coalesce(width)
    # per-address key multiplicities stay OUT of the scoring pipeline (they
    # would otherwise ride the fan-back join into the output schema)
    uq_counts = uq.select("transformed_address", "_n_keys")
    uq = uq.drop("_n_keys")
    cand = _candidates_unique(uq, index)
    ukey = "transformed_address"

    if check_results:
        keep_u, reject_u = _pick_best(_score(cand), key=ukey)
        if use_parent:
            keep_u, reject_u = _parent_rescue(keep_u, reject_u, index, key=ukey)
    else:
        first = cand.withColumn(
            "_rank",
            F.row_number().over(Window.partitionBy(ukey).orderBy(F.col("osm_order").asc())),
        )
        keep_u = first.filter(F.col("_rank") == 1).drop("_rank")
        reject_u = first.filter(F.col("_rank") > 1).drop("_rank").withColumn(
            "reject_reason", F.lit("tail")
        )

    # Pin the SCORED unique frame, not just the dedup: downstream it is
    # read by the retry guards, matched_tas (n_keep count + unmatched
    # anti-join), and the fan-back join — without this the candidate-join +
    # pandas-scoring pipeline re-executes for each of those actions. One
    # row per distinct matched address, so materializing it is cheap.
    keep_u = keep_u.localCheckpoint(eager=True)

    if with_retry:
        keep_u = _retry_low_rank_unique(keep_u, uq, index, check_results)

    # fan back to every input key (reference utils.py:394); drop the query
    # fields from the unique side — the fan side re-supplies them. The fan
    # side also carries the _orig payload struct (caller columns + original
    # address fields) so the cascade never needs a full-input restore join.
    carry = ["_orig"] if "_orig" in addr.columns else []
    fan = addr.select(ADDR_COLS + ["transformed_address"] + carry)
    drop_q = [c for c in ADDR_COLS[1:]]
    # keep_u is ≤ one row per distinct address and already materialized —
    # broadcast it under the measured-size gate so the (large) fan side is
    # never exchanged for this join. Off in the no-broadcast regime to keep
    # that plan shape pure shuffle (test_gazetteer_join_is_broadcast).
    fan_small = index.broadcast_ok and n_uq <= _FAN_BROADCAST_MAX_UNIQUES
    keep_u_fan = keep_u.drop(*drop_q)
    if fan_small:
        keep_u_fan = F.broadcast(keep_u_fan)
    keep = fan.join(keep_u_fan, on="transformed_address", how="inner")
    if with_retry and "_retry_ta" in keep.columns:
        # retried rows report their CLEANSED composed address, like the
        # reference's retry results (utils.py:272-276)
        keep = keep.withColumn(
            "transformed_address",
            F.coalesce(F.col("_retry_ta"), F.col("transformed_address")),
        ).drop("_retry_ta")
    reject = fan.join(reject_u.drop(*drop_q), on="transformed_address", how="inner")

    # Control-flow byproducts at the UNIQUE level, so the cascade loop never
    # scans the fanned input again just to count or shrink:
    # - n_keep: how many fanned rows ``keep`` holds, as sum of multiplicities
    #   over the matched distinct addresses (retry splices never change the
    #   matched-address SET, only its rows, so the sum is exact);
    # - unmatched: the next todo set, rebuilt from the carried _orig payload
    #   through a unique-key anti-join (small side -> AQE broadcasts it)
    #   instead of a full-input shuffle on addr_key.
    matched_tas = keep_u.select(ukey).distinct()
    if fan_small:
        # one narrow string column, ≤ n_uq rows: broadcast the anti-join's
        # small side at plan time instead of waiting for AQE
        matched_tas = F.broadcast(matched_tas)
    n_keep = None
    if with_counts:  # the retry recursion ignores counts — skip the action
        row = uq_counts.join(matched_tas, on=ukey, how="inner").agg(
            F.sum("_n_keys")
        ).first()
        n_keep = int(row[0] or 0)
    unmatched = None
    if carry:
        unmatched = (
            addr.select("transformed_address", "addr_key", "_orig")
            .join(matched_tas, on=ukey, how="left_anti")
            .select(
                "addr_key",
                *[F.col(f"_orig.{c}").alias(c) for c in ADDR_COLS[1:]],
                "_orig",
            )
        )
    return keep, reject, n_keep, unmatched


def _retry_low_rank_unique(
    keep_u: DataFrame, uq: DataFrame, index: GazetteerIndex, check_results: bool
) -> DataFrame:
    """Cleansed-house-number retry for place_rank<30 — reference
    retry_with_low_place_rank (utils.py:225-299) — at the UNIQUE-query
    level: keyed by the ORIGINAL composed address, so the result splices
    back into keep_u before the (single) fan-back join. The cheap isEmpty
    guards scan only unique-level frames, never the fanned input."""
    low = keep_u.filter(F.col("place_rank") < 30).select("transformed_address").distinct()
    if low.isEmpty():
        return keep_u

    retry_in = (
        uq.join(low, on="transformed_address", how="inner")
        .filter(~F.coalesce(F.col("housenbr"), F.lit("")).rlike("^[0-9]*$"))
        # the original composed address becomes the key the retry fans back to
        .withColumn("addr_key", F.col("transformed_address"))
        .withColumn("housenbr", digit_prefix_col(F.col("housenbr")))
        .withColumn(
            "transformed_address",
            compose_address_col(
                F.col("street"), F.col("housenbr"), F.col("postcode"), F.col("city"), F.col("country")
            ),
        )
        .select(ADDR_COLS + ["transformed_address"])
    )
    if retry_in.isEmpty():
        return keep_u

    retried, _, _, _ = _process(
        retry_in, index, check_results, use_parent=False, with_counts=False
    )
    improved = retried.filter(F.col("place_rank") == 30).withColumn(
        "match_on_cleansed_house_number", F.lit(True)
    )
    if improved.isEmpty():
        return keep_u

    # reshape to keep_u's key space: addr_key here IS the original
    # transformed_address; the cleansed one rides along for reporting
    improved_u = (
        improved.withColumn("_retry_ta", F.col("transformed_address"))
        .drop("transformed_address")
        .withColumnRenamed("addr_key", "transformed_address")
    )
    kept = keep_u.join(
        improved_u.select("transformed_address").distinct(),
        on="transformed_address",
        how="left_anti",
    )
    # re-pin after the splice: the union's retried side roots in a recursive
    # _process fan join that would otherwise re-run per downstream action
    return kept.unionByName(improved_u, allowMissingColumns=True).localCheckpoint(
        eager=True
    )


# ---------------------------------------------------------------------------
# transformers
# ---------------------------------------------------------------------------

_LPOST_SCHEMA = StructType(
    [
        StructField("road", StringType()),
        StructField("house_number", StringType()),
        StructField("postcode", StringType()),
        StructField("city", StringType()),
        StructField("country", StringType()),
    ]
)

_COUNTRY_WORDS = {"belgique", "belgie", "belgië", "belgium", "be"}
_PC_SEG = re.compile(r"(?:^|\s)([A-Z]?-?\d{4})(?:\s|$)")
_HOUSE_SEG = re.compile(r"^\d{1,5}[a-zA-Z]?$|^\d{1,5}\s*(?:bt|bte|bus|box|b)\.?\s*\w{1,4}$", re.IGNORECASE)
_TRAILING_HOUSE = re.compile(
    r"^(.*?[^\s\d])\s+(\d{1,5}[a-zA-Z]?(?:\s*(?:bt|bte|bus|box)\.?\s*\w{1,4})?)$",
    re.IGNORECASE,
)


def parse_address_rule_based(full: str | None) -> dict[str, str | None]:
    """Deterministic libpostal-style parser for composed addresses
    ("street, house, postcode city, country"). This is the in-cluster
    analog of the reference's libpostal REST service
    (transformers.py:261-320); fixtures define its contract
    (SURVEY.md stage-2 note — the exact ML parser is not reproducible
    without the service)."""
    out: dict[str, str | None] = {
        "road": None, "house_number": None, "postcode": None, "city": None, "country": None
    }
    if not full:
        return out
    for part in (p.strip() for p in full.split(",")):
        if not part:
            continue
        if part.lower() in _COUNTRY_WORDS:
            if out["country"] is None:
                out["country"] = part
            continue
        m = _PC_SEG.search(part)
        if m and out["postcode"] is None:
            out["postcode"] = m.group(1)
            rest = (part[: m.start()] + " " + part[m.end() :]).strip()
            if rest and out["city"] is None:
                out["city"] = rest
            continue
        if _HOUSE_SEG.match(part) and out["house_number"] is None and out["road"] is not None:
            out["house_number"] = part
            continue
        if out["road"] is None:
            t = _TRAILING_HOUSE.match(part)
            if t:
                out["road"] = t.group(1)
                out["house_number"] = t.group(2)
            else:
                out["road"] = part
            continue
        if out["city"] is None:
            out["city"] = part
    return out


@pandas_udf(_LPOST_SCHEMA)
def _lpost_parse_udf(full: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([parse_address_rule_based(v) for v in full.tolist()])


# ---------------------------------------------------------------------------
# extraHouseNumber enrichment (reference utils.py:782-843, API default true
# nominatimwrapper.py:497, applied post-restore at utils.py:1273-1274)
# ---------------------------------------------------------------------------

_HOUSE_UNIT = re.compile(r"^(\d{1,5}[a-zA-Z]?)\s*(?:bt|bte|bus|box|b)\.?\s*(\w{1,4})$", re.IGNORECASE)


def split_house_unit(housenbr: str | None) -> tuple[str, str]:
    """Split a house field into (house_number, unit): '12 bte 4' ->
    ('12', '4'); plain '12b' -> ('12b', '')."""
    if not housenbr:
        return "", ""
    m = _HOUSE_UNIT.match(housenbr.strip())
    if m:
        return m.group(1), m.group(2)
    return housenbr.strip(), ""


def lpost_address_tokens(full: str | None) -> list[tuple[str, str]]:
    """libpostal-style (value, label) token list from the rule-based parser,
    with the house field split into house_number vs unit labels the way
    libpostal labels box numbers."""
    parsed = parse_address_rule_based(full)
    toks: list[tuple[str, str]] = []
    for label in ("road", "house_number", "postcode", "city", "country"):
        v = parsed[label]
        if not v:
            continue
        if label == "house_number":
            h, u = split_house_unit(v)
            if h:
                toks.append((h, "house_number"))
            if u:
                toks.append((u, "unit"))
        else:
            toks.append((v, label))
    return toks


def join_lpost_tokens(tokens: list[tuple[str, str]]) -> list[str]:
    """The reference's get_lpost_house_number join contract
    (utils.py:800-801): every house_number token joined with ';', every
    unit token joined with ';' -> [housenbr, boxnbr]."""
    return [
        ";".join(v for v, lbl in tokens if lbl == "house_number"),
        ";".join(v for v, lbl in tokens if lbl == "unit"),
    ]


def lpost_house_number(full: str | None) -> list[str]:
    return join_lpost_tokens(lpost_address_tokens(full))


@pandas_udf(ArrayType(StringType()))
def _lpost_house_number_udf(full: pd.Series) -> pd.Series:
    return full.map(lpost_house_number)


def add_extra_house_number(results: DataFrame) -> DataFrame:
    """Attach in_house_number (the INPUT house number) and
    libpostal_house_number ([house, box] parsed from
    'street housenbr, postcode city' — the same composed string the
    reference sends to libpostal, utils.py:838)."""
    full = F.trim(
        F.concat(
            F.coalesce(F.col("street"), F.lit("")), F.lit(" "),
            F.coalesce(F.col("housenbr"), F.lit("")), F.lit(", "),
            F.coalesce(F.col("postcode"), F.lit("")), F.lit(" "),
            F.coalesce(F.col("city"), F.lit("")),
        )
    )
    return results.withColumn(
        "in_house_number", F.coalesce(F.col("housenbr"), F.lit(""))
    ).withColumn("libpostal_house_number", _lpost_house_number_udf(full))


def libpostal_transformer(addr: DataFrame, check_results: bool) -> DataFrame:
    """Parse the composed address and substitute parsed fields
    (reference transformers.py:261-320). check_results re-ranks with the
    same elimination/best logic the reference applies."""
    full = compose_address_col(
        F.col("street"), F.col("housenbr"), F.col("postcode"), F.col("city"), F.col("country")
    )
    parsed = addr.withColumn("_lp", _lpost_parse_udf(full))
    out = parsed.select(
        "addr_key",
        F.coalesce(F.col("_lp.road"), F.lit("")).alias("lp_street"),
        F.coalesce(F.col("_lp.house_number"), F.lit("")).alias("lp_housenbr"),
        F.coalesce(F.col("_lp.postcode"), F.lit("")).alias("lp_postcode"),
        F.coalesce(F.col("_lp.city"), F.lit("")).alias("lp_city"),
        F.coalesce(F.col("_lp.country"), F.lit("")).alias("lp_country"),
        "street", "housenbr", "postcode", "city", "country",
    )

    if check_results:
        # reference: ignore_mismatch_keep_bests(input-side a vs lpost-side b)
        scored = (
            out.withColumn("sim_street", street_sim(F.coalesce("street", F.lit("")), F.col("lp_street")))
            .withColumn("sim_house_number", house_number_sim(F.coalesce("housenbr", F.lit("")), F.col("lp_housenbr")))
            .withColumn("sim_post_code", postcode_sim(F.coalesce("postcode", F.lit("")), F.col("lp_postcode")))
            .withColumn("sim_city", city_sim(F.coalesce("city", F.lit("")), F.col("lp_city")))
        )
        out = scored.filter(
            ~elimination_rule(F.col("sim_post_code"), F.col("sim_city"), F.col("sim_street"))
        ).drop("sim_street", "sim_house_number", "sim_post_code", "sim_city")

    return out.select(
        "addr_key",
        F.col("lp_street").alias("street"),
        F.col("lp_housenbr").alias("housenbr"),
        F.col("lp_postcode").alias("postcode"),
        F.col("lp_city").alias("city"),
        F.col("lp_country").alias("country"),
    )


def photon_transformer(addr: DataFrame, index: GazetteerIndex, check_results: bool = True) -> DataFrame:
    """Fuzzy street correction — the in-cluster Photon analog
    (transformers.py:182-247): candidate streets of the same locality
    (postcode or city fingerprint), re-ranked by the reference's check
    (photon_keep_relevant_results, transformers.py:40-77: street compare +
    postcode/city elimination, fake house number), best per key wins with
    photon_order as tie-break."""
    q = (
        addr.select(ADDR_COLS)
        .withColumn("q_city_key", city_key_udf(F.col("city")))
        .withColumn("q_pc", F.coalesce(F.col("postcode"), F.lit("")))
    )
    streets = index.hinted(
        index.lookup.filter(F.col("place_rank") == 26).select(
            "key_city", "post_code", "importance", "place_id",
            F.col("out_street_name").alias("ph_street"),
            F.col("out_post_name").alias("ph_city"),
            F.col("out_post_code").alias("ph_postcode"),
            F.col("out_country_name").alias("ph_country"),
        ).dropDuplicates(["place_id"])
    )

    by_pc = q.filter(F.col("q_pc") != "").join(streets, F.col("q_pc") == streets.post_code)
    by_city = q.filter(F.col("q_city_key") != "").join(streets, F.col("q_city_key") == streets.key_city)
    cand = by_pc.unionByName(by_city).dropDuplicates(["addr_key", "place_id"])

    ph_order = Window.partitionBy("addr_key").orderBy(F.col("importance").desc(), F.col("place_id").asc())
    cand = cand.withColumn("photon_order", F.row_number().over(ph_order))

    scored = (
        cand.withColumn("sim_street", street_sim(F.col("ph_street"), F.coalesce("street", F.lit(""))))
        .withColumn("sim_post_code", postcode_sim(F.col("ph_postcode"), F.coalesce("postcode", F.lit(""))))
        .withColumn("sim_city", city_sim(F.col("ph_city"), F.coalesce("city", F.lit(""))))
        .withColumn("sim_house_number", F.lit(0.0))  # fake house number, ref transformers.py:63
    )
    if check_results:
        scored = scored.filter(
            ~elimination_rule(F.col("sim_post_code"), F.col("sim_city"), F.col("sim_street"))
        )
    w = Window.partitionBy("addr_key").orderBy(
        F.col("sim_street").desc(), F.col("sim_house_number").desc(), F.col("photon_order").asc()
    )
    best = scored.withColumn("_rank", F.row_number().over(w)).filter(F.col("_rank") == 1)

    return best.select(
        "addr_key",
        F.col("ph_street").alias("street"),
        F.col("housenbr"),  # photon house number is never used (ref :235)
        F.col("ph_postcode").alias("postcode"),
        F.col("ph_city").alias("city"),
        F.col("ph_country").alias("country"),
    )


def apply_transformers(
    addr: DataFrame, transformers: list[str], index: GazetteerIndex, check_results: bool
) -> DataFrame:
    """Sequentially apply a transformer list, then keep only rows actually
    CHANGED by the sequence (case-insensitive 5-field compare vs the
    originals) — reference apply_transformers utils.py:692-776."""
    carry = ["_orig"] if "_orig" in addr.columns else []
    if transformers == ["orig"]:
        return addr.select(ADDR_COLS + carry)

    out = addr.select(ADDR_COLS)
    for t in transformers:
        if t == "orig":
            continue
        m = re.match(r"regex\[([a-z]+)\]", t)
        if m:
            s, h = apply_regex_ruleset(F.col("street"), F.col("housenbr"), m.group(1))
            out = out.withColumn("street", s).withColumn("housenbr", h)
        elif t == "nonum":
            out = out.withColumn("housenbr", F.lit(""))
        elif t == "nostreet":
            out = out.withColumn("housenbr", F.lit("")).withColumn("street", F.lit(""))
        elif t == "nozip":
            out = out.withColumn("postcode", F.lit(""))
        elif t == "nocountry":
            out = out.withColumn("country", F.lit(""))
        elif t == "libpostal":
            out = libpostal_transformer(out, check_results)
        elif t == "photon":
            out = photon_transformer(out, index, check_results)
        else:
            raise ValueError(f"unknown transformer {t!r}")

    orig = addr.select(
        "addr_key", *[F.col(c).alias(f"_o_{c}") for c in ADDR_COLS[1:]], *carry
    )
    joined = out.join(orig, on="addr_key", how="inner")
    changed = F.lit(False)
    for c in ADDR_COLS[1:]:
        changed = changed | (
            F.lower(F.coalesce(F.col(c).cast("string"), F.lit("")))
            != F.lower(F.coalesce(F.col(f"_o_{c}").cast("string"), F.lit("")))
        )
    return joined.filter(changed).select(ADDR_COLS + carry)


# ---------------------------------------------------------------------------
# cascade driver
# ---------------------------------------------------------------------------

RESULT_COLS = [
    "addr_key", "method", "place_id", "parent_place_id", "place_rank", "lat", "lon",
    "out_street_name", "out_post_name", "out_house_number", "out_post_code",
    "out_country_name", "out_other", "namedetails", "osm_order",
    "transformed_address", "match_on_cleansed_house_number",
    "sim_street", "sim_street_which", "sim_house_number", "sim_post_code", "sim_city",
]
REJECT_EXTRA = ["reject_reason"]


def _one_stage(
    todo: DataFrame, transformers: list[str], index: GazetteerIndex, check_results: bool
) -> tuple[DataFrame, DataFrame, int, DataFrame | None]:
    """transform_and_process analog (utils.py:589-688). Returns
    (keep, reject, n_keep, unmatched-todo) — the last two computed at the
    unique-address level inside _process (no extra pass over the fan)."""
    method = "+".join(transformers)
    if transformers == ["orig"] and "_ta0" in todo.columns:
        # the orig stage's composed address was precomputed INTO the input
        # checkpoint (cascade below): both the dedup pass and the fan-back
        # pass read it as stored bytes instead of re-running the regex
        # composition over every input row (the single hottest JVM
        # expression of the job — measured ~2x the whole scoring pipeline
        # at 2M pages).
        carry0 = ["_orig"] if "_orig" in todo.columns else []
        sent = todo.select(
            *ADDR_COLS, *carry0, F.col("_ta0").alias("transformed_address")
        )
    else:
        transformed = apply_transformers(todo, transformers, index, check_results)
        sent = transformed.withColumn(
            "transformed_address",
            compose_address_col(
                F.col("street"), F.col("housenbr"), F.col("postcode"), F.col("city"), F.col("country")
            ),
        )
    if transformers != ["orig"]:
        # transformer stages run UDF joins (libpostal/photon) — materialize
        # once so the multiple consumers (dedup, fan-back, retry) don't
        # re-run them. The orig stage is a pure Column op over the already
        # checkpointed todo set: materializing it would rewrite every input
        # row once more just to add one column.
        sent = sent.localCheckpoint(eager=True)

    keep, reject, n_keep, unmatched = _process(
        sent, index, check_results, with_retry=True
    )
    if unmatched is not None and transformers != ["orig"]:
        # the changed-rows filter (and any transformer dropout) removed rows
        # from ``sent`` before _process saw them — they are unmatched too.
        # Small-vs-small anti-join: todo at transformer stages is the
        # already-shrunken no-match tail, sent is checkpointed.
        dropped = todo.join(sent.select("addr_key"), on="addr_key", how="left_anti")
        unmatched = unmatched.unionByName(dropped.select(*unmatched.columns))

    keep = keep.withColumn("method", F.lit(method))
    reject = reject.withColumn("method", F.lit(method))
    keep_cols = RESULT_COLS + ["street", "housenbr", "postcode", "city", "country"]
    if "_orig" in keep.columns:
        keep_cols = keep_cols + ["_orig"]
    return _conform(keep, keep_cols), _conform(reject, RESULT_COLS + REJECT_EXTRA), n_keep, unmatched


def _conform(df: DataFrame, cols: list[str]) -> DataFrame:
    have = set(df.columns)
    sel = []
    for c in cols:
        if c == "match_on_cleansed_house_number":
            src = F.col(c) if c in have else F.lit(None).cast("boolean")
            sel.append(F.coalesce(src, F.lit(False)).alias(c))
        elif c in have:
            sel.append(F.col(c))
        else:
            sel.append(F.lit(None).cast("string").alias(c))
    return df.select(sel)


def _is_materialized(df: DataFrame) -> bool:
    """True when the frame's plan is already a materialized row scan
    (localCheckpoint / RDD-backed) rather than a computation."""
    try:
        return (
            df._jdf.queryExecution().analyzed().getClass().getSimpleName()
            == "LogicalRDD"
        )
    except Exception:  # pragma: no cover - py4j surface change
        return False


def cascade(
    addresses: DataFrame,
    index: GazetteerIndex,
    check_results: bool = True,
    transformers_sequence: list[list[str]] | None = None,
    with_rejected: bool = True,
    with_stats: bool = False,
    validate_unique: bool = True,
    with_extra_house_number: bool = True,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, list[dict]]:
    """process_addresses analog (utils.py:1195-1279): run the transformer
    ladder, shrink the working set by left-anti join after each stage, tag
    each match with the stage that produced it (``method`` — the fallback
    level the fixtures pin), then restore the ORIGINAL input fields.

    Input: DataFrame with ADDR_COLS. addr_key must be unique
    (reference aborts on duplicates, nominatimwrapper.py:789-790).
    """
    spark = addresses.sparkSession
    seqs = transformers_sequence or DEFAULT_TRANSFORMERS_SEQUENCE

    # materialize the input ONCE: the duplicate guard, every stage, and the
    # final original-fields restore all reuse it — without this the input
    # plan (often an extraction-UDF pipeline over raw pages) is re-evaluated
    # three times. Skip when the caller already handed us materialized rows
    # (a checkpoint scan) — re-checkpointing would rewrite every input row
    # once more for nothing.
    if not _is_materialized(addresses):
        # bake the orig stage's composed address into the same checkpoint:
        # it is needed by the dedup pass AND the fan-back pass, so computing
        # it once at materialization time (instead of per consuming pass)
        # halves the job's regex-composition cost for one extra stored
        # string column (~50 B/row)
        addresses = addresses.withColumn(
            "_ta0",
            compose_address_col(
                F.col("street"), F.col("housenbr"), F.col("postcode"),
                F.col("city"), F.col("country"),
            ),
        ).localCheckpoint(eager=True)

    if validate_unique:  # skippable when keys are unique by construction
        dup = addresses.groupBy("addr_key").count().filter("count > 1")
        if not dup.isEmpty():
            raise ValueError("duplicate addr_key values in input")

    # Pack the full original row (original address fields + caller columns
    # like url/warc_ts) into one struct carried through every stage's
    # fan-back join. Expanding it at the end replaces the reference's final
    # merge(to_process_addresses, how="left") (utils.py:1271) — which as a
    # full-input-vs-results shuffle join would be the largest shuffle of the
    # whole job at 100 TB — with a zero-shuffle projection.
    orig_payload = [c for c in addresses.columns if c not in ("addr_key", "_ta0")]
    ta0 = ["_ta0"] if "_ta0" in addresses.columns else []
    todo = addresses.select(
        *ADDR_COLS, F.struct(*[F.col(c) for c in orig_payload]).alias("_orig"), *ta0
    )
    n_todo = addresses.count()  # cheap: checkpointed
    results: DataFrame | None = None
    rejects: DataFrame | None = None
    step_stats: list[dict] = []

    # Materializing each stage's fanned-back keep frame stores the FULL
    # result width (input row + _orig payload + result fields) — at 2M+
    # pages that block write is the single largest core-count-independent
    # cost in the job. It's only worth paying when the frame really is
    # read more than once at full width: stats mode (several counts per
    # stage) and rejected mode (results re-scanned for the distance join).
    # Otherwise the unique-level checkpoints inside _process already pin
    # the expensive scoring, and the fan-back is a rescan-cheap broadcast
    # join: n_keep and the anti-join read it column-pruned, the final sink
    # reads it full-width exactly once.
    materialize_stages = with_stats or with_rejected

    for transformers in seqs:
        stage_t0 = time.monotonic()
        keep, reject, n_keep, unmatched = _one_stage(todo, transformers, index, check_results)
        # Lineage stays bounded either way: every stage's todo is
        # checkpointed below, so each keep plan is rooted one stage deep.
        # This is the Spark analog of the reference's per-stage
        # materialized pandas frames; on a cluster the same boundary is
        # the S7 per-partition checkpoint.
        if materialize_stages:
            keep = keep.localCheckpoint(eager=True)
        results = keep if results is None else results.unionByName(keep)
        if with_rejected:
            reject = reject.localCheckpoint(eager=True)
            rejects = reject if rejects is None else rejects.unionByName(reject)

        if with_stats:
            # per-stage counters — reference step_stats (utils.py:678-686) —
            # plus wall time per stage, the reference's timestats label map
            # (base.py:275-301); every frame here is checkpointed (the stage
            # really ran inside the timed span) so these are cheap scans
            stat = {
                "method": "+".join(transformers),
                "wall_s": round(time.monotonic() - stage_t0, 3),
                "todo": todo.count(),
                "match": keep.count(),
                "match_26": keep.filter(F.col("match_on_cleansed_house_number")).count(),
            }
            if with_rejected:
                stat["reject_rec"] = reject.count()
                stat["reject_addr"] = reject.select("addr_key").distinct().count()
                stat["reject_mism"] = (
                    reject.filter(F.col("reject_reason") == "mismatch")
                    .select("addr_key").distinct().count()
                )
            step_stats.append(stat)

        # n_keep came from the unique-level multiplicity sum (one row per
        # matched key in keep), so the everyone-matched break costs nothing
        if n_keep >= n_todo:
            break
        if n_keep == 0:
            continue  # nothing matched this stage; same todo set
        # next working set: the unique-key anti-join byproduct of the stage
        # (matched-address set is the SMALL side — AQE broadcasts it), never
        # a full-input shuffle on addr_key
        todo = unmatched.localCheckpoint(eager=True)
        n_todo -= n_keep

    assert results is not None
    # restore the FULL original input row — including caller columns beyond
    # ADDR_COLS (url, warc_ts, ...) — from the carried _orig struct: the
    # reference's merge(to_process_addresses, how="left") at utils.py:1271
    # without the join (see the _orig note above)
    results = (
        results.drop("street", "housenbr", "postcode", "city", "country")
        .select("*", "_orig.*")
        .drop("_orig")
    )

    if with_extra_house_number:
        # reference: applied AFTER the original-fields restore
        # (utils.py:1273-1274), so it parses the ORIGINAL input fields
        results = add_extra_house_number(results)

    if with_rejected and rejects is not None:
        # distance from each reject to its key's accepted match (utils.py:1080-1093)
        m = results.select(
            "addr_key", F.col("lat").alias("_mlat"), F.col("lon").alias("_mlon")
        )
        rejects = rejects.join(m, on="addr_key", how="left").withColumn(
            "distance_to_match",
            F.round(haversine_col(F.col("lat"), F.col("lon"), F.col("_mlat"), F.col("_mlon")), 3),
        ).drop("_mlat", "_mlon")
    else:
        rejects = spark.createDataFrame([], schema=_reject_schema())

    if with_stats:
        return results, rejects, step_stats
    return results, rejects


def _reject_schema():
    from pyspark.sql.types import DoubleType

    fields = [StructField(c, StringType()) for c in RESULT_COLS + REJECT_EXTRA]
    fields.append(StructField("distance_to_match", DoubleType()))
    return StructType(fields)
