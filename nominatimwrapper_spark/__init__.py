"""nominatimwrapper_spark — a from-scratch PySpark-native geocoding +
spatial-join engine with the query/data-processing capabilities of
SmalsResearch/NominatimWrapper (reference read-only at /root/reference).

Architecture: DataFrame/SQL-first. The reference's per-address REST calls
(Nominatim/Photon/libpostal services) are replaced by in-cluster broadcast
gazetteer joins and vectorized pandas/Arrow UDFs; its pandas MultiIndex
frames become fixed-schema columnar DataFrames.

Layout
------
functions/   scalar kernels: text extraction, address cleansing, similarity
             (Damerau-Levenshtein, fingerprint, inclusion), geo (haversine,
             S2 / H3 cell ids, grid tiles)
operators/   dataflow operators: geocode cascade, point-in-polygon, kNN,
             tile rollups, dedup (exact/MinHash/SimHash), similarity search,
             text stats, as-of dedup, multimodal plumbing
sources/     partitioned parquet reader/writer + per-partition checkpoint
             manifests (resume without recompute)
streaming/   Structured Streaming demo (watermark + windowed aggregation)
"""

__version__ = "0.1.0"
