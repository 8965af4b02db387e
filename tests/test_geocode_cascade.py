# -*- coding: utf-8 -*-
"""End-to-end cascade fixtures: every synthetic address must resolve at its
engineered transformer stage with the expected place_id / place_rank
(FIXTURES.md §3, SURVEY.md §5.2.3)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nominatimwrapper_spark.operators.geocode import (
    build_gazetteer_index,
    cascade,
)
from nominatimwrapper_spark.synth import gen_world


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    w = gen_world(n_streets=120, houses_per_street=6, n_pages=50, n_per_class=6)
    from nominatimwrapper_spark.synth import write_world

    d = tmp_path_factory.mktemp("world")
    write_world(str(d), w)
    w["_dir"] = str(d)
    return w


@pytest.fixture(scope="module")
def index(spark, world):
    gaz = spark.read.parquet(f"{world['_dir']}/gazetteer.parquet")
    return build_gazetteer_index(gaz)


@pytest.fixture(scope="module")
def cascade_out(spark, world, index):
    a = world["addresses"]
    addr = spark.createDataFrame(
        a.rename(
            columns=dict(
                referenceKey="addr_key", streetName="street", houseNumber="housenbr",
                postCode="postcode", postName="city", countryName="country",
            )
        )[["addr_key", "street", "housenbr", "postcode", "city", "country"]]
    )
    results, rejects = cascade(addr, index, check_results=True)
    return results.toPandas(), rejects.toPandas(), a


def test_expected_method_and_rank(cascade_out):
    res, _rej, a = cascade_out
    res = res.set_index("addr_key")
    failures = []
    for _, row in a.iterrows():
        k = row.referenceKey
        if row.expected_method == "NOMATCH":
            if k in res.index:
                failures.append((k, row.addr_class, "matched but expected NOMATCH",
                                 res.loc[k, "method"]))
            continue
        if k not in res.index:
            failures.append((k, row.addr_class, "no match", None))
            continue
        got = res.loc[k]
        if got["method"] != row.expected_method:
            failures.append((k, row.addr_class, f"method {got['method']}", row.expected_method))
        elif int(got["place_rank"]) != int(row.expected_place_rank):
            failures.append((k, row.addr_class, f"rank {got['place_rank']}", row.expected_place_rank))
        elif int(got["place_id"]) != int(row.expected_place_id):
            failures.append((k, row.addr_class, f"pid {got['place_id']}", row.expected_place_id))
    assert not failures, f"{len(failures)} fixture mismatches: {failures[:12]}"


def test_one_result_per_key(cascade_out):
    res, _rej, _a = cascade_out
    assert res.addr_key.value_counts().max() == 1


def test_cleansed_house_number_flag(cascade_out):
    res, _rej, a = cascade_out
    res = res.set_index("addr_key")
    for _, row in a[a.addr_class == "retry26"].iterrows():
        got = res.loc[row.referenceKey]
        assert bool(got["match_on_cleansed_house_number"]), row.referenceKey
    # and never set on exact matches
    for _, row in a[a.addr_class == "orig_exact"].iterrows():
        assert not bool(res.loc[row.referenceKey, "match_on_cleansed_house_number"])


def test_original_input_restored(cascade_out):
    res, _rej, a = cascade_out
    merged = res.merge(
        a.rename(columns=dict(referenceKey="addr_key")), on="addr_key", how="inner"
    )
    assert (merged.street == merged.streetName).all()
    assert (merged.housenbr == merged.houseNumber).all()


def test_rejects_have_reason_and_distance(cascade_out):
    _res, rej, _a = cascade_out
    if len(rej):
        assert set(rej.reject_reason.unique()) <= {"mismatch", "tail"}
        with_match = rej[rej.distance_to_match.notna()]
        assert (with_match.distance_to_match >= 0).all()


def test_collapse_map_output_path(cascade_out, world):
    """A6/A7 load-bearing end-to-end: the gazetteer's nominatim-style
    address map has dynamic keys (street under road/pedestrian/square...,
    locality under town/village/...), plus suburb/state extras. The output
    path must (a) resolve out_street_name through the collapse priority
    list whatever key the street arrived under, and (b) set-collapse every
    unconsumed value into out_other."""
    res, _rej, _a = cascade_out
    gaz = world["gazetteer"].set_index("place_id")
    street_keys = {"road", "pedestrian", "footway", "cycleway", "path",
                   "address27", "construction", "hamlet", "park", "square"}
    picked_keys = street_keys | {"town", "village", "city_district", "county",
                                 "city", "house_number", "country", "postcode"}
    n_nonroad = 0
    n_other = 0
    for _, row in res.iterrows():
        amap = gaz.loc[int(row.place_id), "address"]
        skey = next((k for k in amap if k in street_keys), None)
        if skey and skey != "road":
            n_nonroad += 1
            assert row.out_street_name == amap[skey], (row.place_id, skey)
        extras = {v for k, v in amap.items() if k not in picked_keys}
        got = set(row.out_other.split(" - ")) if row.out_other else set()
        assert got == extras, (row.place_id, got, extras)
        n_other += bool(extras)
    assert n_nonroad > 0  # dynamic keys actually exercised
    assert n_other > 0    # extras actually collapsed into other


def test_extra_house_number_columns(cascade_out):
    """extraHouseNumber enrichment (reference utils.py:811-843, default-on
    API flag): in_house_number echoes the INPUT house number;
    libpostal_house_number is [house, box] parsed from the composed input."""
    res, _rej, a = cascade_out
    assert "in_house_number" in res.columns and "libpostal_house_number" in res.columns
    r = res.set_index("addr_key")
    a_idx = a.set_index("referenceKey")
    for k in r.index:
        assert r.loc[k, "in_house_number"] == (a_idx.loc[k, "houseNumber"] or "")
    # retry26 fixtures have 'N bt 2' house numbers -> split house/box
    for _, row in a[a.addr_class == "retry26"].iterrows():
        got = list(r.loc[row.referenceKey, "libpostal_house_number"])
        base = row.houseNumber.split(" bt ")[0]
        assert got == [base, "2"], (row.houseNumber, got)
    # plain numeric houses -> [n, ""]
    for _, row in a[a.addr_class == "orig_exact"].iterrows():
        got = list(r.loc[row.referenceKey, "libpostal_house_number"])
        assert got == [str(row.houseNumber), ""], (row.houseNumber, got)


def test_extra_house_number_differential(refmod, monkeypatch):
    """The join/extract contract of get_lpost_house_number
    (reference utils.py:782-808) — multiple house_number tokens joined with
    ';', unit tokens with ';' — checked by feeding the reference function
    our token stream."""
    from nominatimwrapper_spark.operators.geocode import (
        join_lpost_tokens,
        lpost_address_tokens,
        lpost_house_number,
    )

    cases = [
        "Rue Haute 12, 1000 Bruxelles",
        "Avenue Louise 20 bte 4, 1050 Ixelles",
        "Chaussee de Gand 3b, 1080 Molenbeek",
        ", 1000 Bruxelles",
        "",
    ]
    for addr in cases:
        toks = lpost_address_tokens(addr)
        monkeypatch.setattr(refmod.utils, "parse_address", lambda a, t=toks: [(v, l) for v, l in t])
        ref = refmod.utils.get_lpost_house_number(addr)
        assert ref == lpost_house_number(addr), addr

    # synthetic multi-token streams: the ';' join semantics themselves
    multi = [("20", "house_number"), ("box 2", "unit"), ("22", "house_number"), ("3", "unit")]
    monkeypatch.setattr(refmod.utils, "parse_address", lambda a: [(v, l) for v, l in multi])
    assert refmod.utils.get_lpost_house_number("x") == join_lpost_tokens(multi) == ["20;22", "box 2;3"]


def test_non_broadcast_path_same_results(spark, world, index, cascade_out):
    """When the gazetteer index is too big to broadcast (broadcast_ok=False,
    byte-estimated), the candidate joins fall back to shuffle joins — the
    RESULTS must be identical to the broadcast path."""
    import dataclasses

    res_b, _, _ = cascade_out
    shuffled_index = dataclasses.replace(index, broadcast_ok=False)
    a = world["addresses"]
    addr = spark.createDataFrame(
        a.rename(
            columns=dict(
                referenceKey="addr_key", streetName="street", houseNumber="housenbr",
                postCode="postcode", postName="city", countryName="country",
            )
        )[["addr_key", "street", "housenbr", "postcode", "city", "country"]]
    )
    res_s, _ = cascade(addr, shuffled_index, check_results=True)
    res_s = res_s.toPandas()
    key_cols = ["addr_key", "method", "place_id", "place_rank"]
    b = res_b[key_cols].sort_values("addr_key").reset_index(drop=True)
    s = res_s[key_cols].sort_values("addr_key").reset_index(drop=True)
    pd.testing.assert_frame_equal(b, s)


def test_flagship_output_pinned(spark):
    """Value-level gate behind the rows-only ``geocode_flagship`` driver
    row: the COMPLETE sf0.001 flagship output (sorted, quantized lat/lon,
    S2 + H3 cells, methods, place ids) hashes to a pinned digest. Any
    semantic change to extraction, the cascade, scoring, or tiling breaks
    this — rerun and re-pin only after explaining the diff."""
    import hashlib

    from nominatimwrapper_spark.plans.flagship import flagship

    df = flagship(spark, "/root/testdata/sf0.001").toPandas()
    df = df[sorted(df.columns)].sort_values(["addr_key"]).reset_index(drop=True)
    assert list(df.columns) == [
        "addr_key", "cell13", "h3_9", "lat_1e6", "lon_1e6",
        "method", "place_id", "place_rank", "url",
    ]
    digest = hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()
    assert digest == (
        "e6894087f1514840596ff014640971643352b83bca3f6dd19a61700a7f6393e4"
    ), f"flagship output drifted: {digest} ({len(df)} rows)"


def test_skewed_hot_address_fanback(spark, world, index):
    """Skew path: one composed address carried by 60% of all input keys (a
    boilerplate footer address on half the crawl). Scoring runs once at the
    unique level regardless; the fan-back join must give every key of the
    hot address the identical result, exactly one row per key (AQE
    skew-join handles the physical partition split at scale)."""
    a = world["addresses"]
    origs = a[a.expected_method == "orig"]
    base = origs.iloc[0]
    cold = origs.iloc[1:]
    n_hot, n_cold = 6000, 4000
    ci = [i % len(cold) for i in range(n_cold)]
    rows = pd.DataFrame(
        dict(
            addr_key=[f"hot{i}" for i in range(n_hot)]
            + [f"cold{i}" for i in range(n_cold)],
            street=[base.streetName] * n_hot + list(cold.streetName.iloc[ci]),
            housenbr=[base.houseNumber] * n_hot + list(cold.houseNumber.iloc[ci]),
            postcode=[base.postCode] * n_hot + list(cold.postCode.iloc[ci]),
            city=[base.postName] * n_hot + list(cold.postName.iloc[ci]),
            country=[""] * (n_hot + n_cold),
        )
    )
    addr = spark.createDataFrame(rows)
    res, _ = cascade(addr, index, check_results=True, with_rejected=False)
    got = res.select("addr_key", "place_id").toPandas()
    assert got["addr_key"].is_unique and len(got) == n_hot + n_cold
    hot = got[got.addr_key.str.startswith("hot")]
    assert hot["place_id"].nunique() == 1  # every hot key -> same place


def test_broadcast_gate_is_byte_based(spark, world):
    gaz = spark.read.parquet(f"{world['_dir']}/gazetteer.parquet")
    small = build_gazetteer_index(gaz)  # a synth world is far under the cap
    assert small.broadcast_ok
    tiny_cap = build_gazetteer_index(gaz, broadcast_max_bytes=1024)
    assert not tiny_cap.broadcast_ok


def test_duplicate_key_guard(spark, index):
    import pandas as pd

    dup = pd.DataFrame(
        dict(addr_key=["a", "a"], street=["x", "y"], housenbr=["", ""],
             postcode=["1000", "1000"], city=["c", "c"], country=["", ""])
    )
    with pytest.raises(ValueError, match="duplicate"):
        cascade(spark.createDataFrame(dup), index)
