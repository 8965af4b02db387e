# -*- coding: utf-8 -*-
"""Result formatting: mode projections + nested camelCase JSON — the
Spark analog of the reference's REST output layer.

- output modes (reference nominatimwrapper.py:632-648, 820-836):
  ``coordinates`` / ``short`` / ``long`` column projections
- nested structure (multiindex_to_dict, utils.py:174-218): L0 namespaces
  ``input`` / ``metadata`` / ``output`` / ``check`` as struct columns
- camelCase key rename (to_camel_case, utils.py:76-103): a fixed alias
  map — no per-row string munging
- empty-value dropping (skip_none, utils.py:218): to_json ignoreNullFields
  plus explicit ''->null normalization
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# snake_case engine column -> camelCase API key (F15 alias map)
CAMEL = {
    "addr_key": "referenceKey",
    "street": "streetName",
    "housenbr": "houseNumber",
    "postcode": "postCode",
    "city": "postName",
    "country": "countryName",
    "out_street_name": "streetName",
    "out_post_name": "postName",
    "out_house_number": "houseNumber",
    "out_post_code": "postCode",
    "out_country_name": "countryName",
    "out_other": "other",
    "place_id": "placeId",
    "place_rank": "placeRank",
    "transformed_address": "transformedAddress",
    "reject_reason": "rejectReason",
    "distance_to_match": "distanceToMatch",
    "match_on_cleansed_house_number": "matchOnCleansedHouseNumber",
    "sim_street": "simStreet",
    "sim_street_which": "simStreetWhich",
    "sim_house_number": "simHouseNumber",
    "sim_post_code": "simPostCode",
    "sim_city": "simCity",
    "osm_order": "osmOrder",
    "in_house_number": "inHouseNumber",
    "libpostal_house_number": "libpostalHouseNumber",
}

MODES = ("coordinates", "short", "long")


def _nz(c: str) -> Column:
    """''-as-null normalization so to_json drops empties (skip_none)."""
    col = F.col(c)
    return F.when(col.cast("string") == "", F.lit(None)).otherwise(col)


def _struct(cols: list[str], df_cols: set[str]) -> Column:
    fields = [_nz(c).alias(CAMEL.get(c, c)) for c in cols if c in df_cols]
    return F.struct(*fields)


def format_results(results: DataFrame, mode: str = "short") -> DataFrame:
    """Project cascade results per output mode and attach the nested
    camelCase record (struct + JSON string)."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}")
    have = set(results.columns)

    if mode == "coordinates":
        out_cols = ["lat", "lon"]
        meta_cols = ["method", "place_id", "place_rank"]
        check_cols: list[str] = []
    elif mode == "short":
        out_cols = [
            "out_street_name", "out_house_number", "out_post_code", "out_post_name",
            "out_country_name", "other", "out_other", "lat", "lon",
            # extraHouseNumber fields (reference: mode short,full —
            # nominatimwrapper.py:408)
            "in_house_number", "libpostal_house_number",
        ]
        meta_cols = ["method", "place_id", "place_rank", "transformed_address",
                     "match_on_cleansed_house_number", "osm_order"]
        check_cols = []
    else:  # long
        out_cols = [
            "out_street_name", "out_house_number", "out_post_code", "out_post_name",
            "out_country_name", "out_other", "lat", "lon", "namedetails",
            "in_house_number", "libpostal_house_number",
        ]
        meta_cols = ["method", "place_id", "place_rank", "transformed_address",
                     "match_on_cleansed_house_number", "osm_order", "reject_reason",
                     "distance_to_match"]
        check_cols = ["sim_street", "sim_street_which", "sim_house_number",
                      "sim_post_code", "sim_city"]

    input_cols = ["addr_key", "street", "housenbr", "postcode", "city", "country"]
    record = F.struct(
        _struct(input_cols, have).alias("input"),
        _struct(meta_cols, have).alias("metadata"),
        _struct(out_cols, have).alias("output"),
        *([_struct(check_cols, have).alias("check")] if check_cols else []),
    )
    return results.select(
        F.col("addr_key"),
        record.alias("record"),
        F.to_json(record, {"ignoreNullFields": "true"}).alias("record_json"),
    )
