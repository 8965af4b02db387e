# -*- coding: utf-8 -*-
"""Generate the pinned leaf-cell fixtures that back the DuckDB oracles of
``s2_rollup`` / ``h3_rollup`` / ``h3_parent_rollup``.

DuckDB cannot compute S2/H3 cell ids, so the oracle splits the work: the
CELL MATH is pinned here once (golden leaf cells per c_custkey, themselves
gated by the pinned published test vectors in tests/test_s2.py and
tests/test_h3.py), while the PARENT/ROLLUP math runs live in SQL (bit
arithmetic + GROUP BY) against these fixtures joined to the sf0.01
customer table. A cell-math regression then shows up as a value-hash
mismatch in the driver's correctness gate.

Run from the repo root:  python scripts/gen_cell_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


def main() -> None:
    from nominatimwrapper_spark.functions import s2
    from nominatimwrapper_spark.functions.h3 import latlng_to_cell

    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet", columns=["c_custkey"])
    key = cust["c_custkey"].to_numpy()
    lat = 49.5 + (key % 2000) / 1000.0
    lon = 2.5 + ((key * 7) % 3900) / 1000.0

    # the same numpy kernels the Spark UDF wraps
    cell13 = s2.parent_cell(s2.lat_lon_to_leaf_id(lat, lon), 13)
    h3_9 = latlng_to_cell(lat, lon, 9).astype(np.int64)

    os.makedirs(OUT_DIR, exist_ok=True)
    pd.DataFrame({"c_custkey": key, "cell13": cell13.astype(np.int64)}).to_parquet(
        os.path.join(OUT_DIR, "s2_cells_sf001.parquet"), index=False
    )
    pd.DataFrame({"c_custkey": key, "h3_9": h3_9}).to_parquet(
        os.path.join(OUT_DIR, "h3_cells_sf001.parquet"), index=False
    )

    # dedup fixtures: SimHash signatures (shared numpy kernel) and the
    # banded MinHash rows (needs Spark's xxhash64 — the oracle then reruns
    # the bucket SELF-JOIN + band count in SQL over these, so the join
    # semantics are SQL-verified and only the hashing is pinned)
    from nominatimwrapper_spark.operators.dedup import banded_signatures, simhash_np

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    pd.DataFrame(
        {"doc_id": docs.doc_id, "simhash": simhash_np(docs.text.tolist())}
    ).to_parquet(os.path.join(OUT_DIR, "simhash_sf001.parquet"), index=False)

    from nominatimwrapper_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    sdocs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    banded_signatures(sdocs, "doc_id", "text", num_hashes=32, bands=8).toPandas().rename(
        columns={"_id": "doc_id"}
    ).to_parquet(os.path.join(OUT_DIR, "minhash_banded_sf001.parquet"), index=False)
    spark.stop()

    print(f"wrote {len(key)}-row cell + dedup fixtures to {OUT_DIR}")


if __name__ == "__main__":
    main()
