# -*- coding: utf-8 -*-
"""Deduplication operators over the documents corpus (training-data
pipeline ops — graded alongside SURVEY.md §2).

- exact: hash-groupBy (md5 of content) — SQL-oracled
- ngram Jaccard: word 3-shingle set similarity between candidate pairs
- MinHash + LSH: shingles -> k minhashes -> bands -> bucket join -> verify
- SimHash: 64-bit near-dup signature, banded for candidate generation
- embedding cosine near-dup: see simsearch.cosine_topk (reused)

Scale notes: MinHash/LSH is the 100 TB path — the candidate join is an
equi-join on (band_id, band_hash) buckets, never all-pairs; the final
verify recomputes true Jaccard only within buckets. Shingling and hashing
are Column expressions (xxhash64) — no Python in the hot path; nothing
here uses a per-row UDF (SimHash's bit matrix is an Arrow-batched pandas
UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------


def word_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles as array<string> — pure Column ops:
    split -> sliding window via transform(sequence(...)) -> distinct.

    The token split is BOUND ONCE per row through a one-element transform
    whose lambda variable carries the array: referencing the split
    expression directly from the window lambda inlines it, and Catalyst
    evaluates an inlined non-lambda subexpression PER LAMBDA ELEMENT — the
    regex split re-ran once per shingle position (~100x per doc; measured
    as ~90% of the 1M-doc signature stage, 27s -> 4s after binding).

    Each shingle is concat_ws over n element_at lookups, NOT
    array_join(slice(...)): slice materializes a fresh sub-array per
    position (measured 12.4s -> 2.3s for the hashed 1M-doc shingle pass).
    Identical values: concat_ws and array_join both skip nulls, and
    element_at past the end yields null, unreachable here because the
    sequence stops at size - n + 1."""

    def shingles(toks):
        k = F.size(toks) - (n - 1)
        return F.when(k <= 0, F.array(F.array_join(toks, " "))).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), k),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(toks, i + j) for j in range(n)]
                    ),
                )
            )
        )

    bound = F.transform(
        F.array(F.split(F.trim(text_col), "\\s+")), lambda t: shingles(t)
    )
    return F.element_at(bound, 1)


def ngram_jaccard_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """True Jaccard over word n-shingles for consecutive-id candidate pairs
    (a cheap deterministic pairing used for tests/inspection; LSH generates
    real candidates at scale). Output scaled to integer 1e-4 units."""
    a = docs.select(
        F.col(id_col).alias("id_a"), word_shingles(F.col(text_col), n).alias("sh_a")
    )
    b = docs.select(
        (F.col(id_col) - 1).alias("id_a"),
        F.col(id_col).alias("id_b"),
        word_shingles(F.col(text_col), n).alias("sh_b"),
    )
    j = a.join(b, on="id_a", how="inner")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        j.select("id_a", "id_b", F.round(jac * 10000).cast("long").alias("jaccard_1e4"))
        .filter(F.col("jaccard_1e4") >= int(threshold * 10000))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE_31 = (1 << 31) - 1


def _affine_params(num_hashes: int, seed: int = 0x5EED) -> tuple[list[int], list[int]]:
    """Deterministic (a_i, b_i) for the universal hash family
    h_i(x) = (a_i * x + b_i) mod (2^31 - 1), x < 2^31. The modulus must be
    SMALL enough that a_i * x wraps it many times (a near-2^31 a times a
    2^31 x is ~2^62, still inside int64) — with a too-large modulus the map
    is monotonic in x and every "permutation" selects the same min shingle,
    silently degenerating to 1-hash MinHash."""
    state = seed % _MERSENNE_31 or 1
    out_a, out_b = [], []
    for _ in range(num_hashes):
        state = (state * 48271) % _MERSENNE_31  # Lehmer LCG, full period
        out_a.append(state)  # in [1, 2^31-2]
        state = (state * 48271) % _MERSENNE_31
        out_b.append(state)
    return out_a, out_b


def minhash_signature(shingle_col, num_hashes: int = 32):
    """array<long> of minhashes in ONE pass over the shingles.

    Each shingle is hashed ONCE (xxhash64 -> 31 bits); the k hash functions
    are affine maps (a_i*h + b_i) mod (2^31-1) in pure integer Column math,
    folded with a single F.aggregate whose accumulator is the running array
    of k minima. The naive alternative (xxhash64(shingle, seed=i) per
    permutation) re-hashes every shingle string k times — k full passes
    over the text bytes."""
    a_list, b_list = _affine_params(num_hashes)
    lit_a = F.array(*[F.lit(a) for a in a_list])
    lit_b = F.array(*[F.lit(b) for b in b_list])
    hashed = F.transform(
        shingle_col, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF))
    )
    init = F.array(*[F.lit(_MERSENNE_31).cast("long") for _ in range(num_hashes)])
    return F.aggregate(
        hashed,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(lit_a, lit_b, lambda ai, bi: F.pmod(ai * h + bi, F.lit(_MERSENNE_31))),
            lambda x, y: F.least(x, y),
        ),
    )


def hashed_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """(_id, _hsh): per-doc distinct word-shingles hashed ONCE with
    xxhash64 — the shared upstream of both the MinHash signature pipeline
    (which folds the LOW 31 bits through the affine family) and the
    hashed-shingle exact verify (which intersects the full 64-bit values).
    Computing this frame once per dedup run removes a complete second
    shingling pass over the corpus text (split + slide + join + hash per
    doc — measured as the bulk of the signature stage at 1M docs).

    NULL shingles (null/whitespace-only text) hash to NULL here, NOT to
    xxhash64's seed (42): the signature aggregate must see NULL so a
    null-text doc's signature stays NULL. The verify side restores the
    raw-xxhash64 value (42) via coalesce for exact value parity with
    hashing the shingle strings directly."""
    return docs.select(
        F.col(id_col).alias("_id"),
        F.transform(
            word_shingles(F.col(text_col), shingle_n),
            lambda s: F.when(s.isNull(), F.lit(None).cast("long")).otherwise(
                F.xxhash64(s)
            ),
        ).alias("_hsh"),
    )


def _signatures_from_hashed(hs: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(_id, _sig) from a hashed-shingle frame via explode + hash
    aggregate: the k min() columns stay inside whole-stage codegen with
    MAP-SIDE partial aggregation — the shuffle carries one partial row
    per (doc, partition), not the shingles."""
    a_list, b_list = _affine_params(num_hashes)
    # NULL elements propagate: NULL & mask is NULL, min() skips NULLs,
    # count(_h) counts only non-NULL — a null-text doc yields _nh = 0 and
    # a NULL signature, value-identical to hashing the strings directly.
    hashed = hs.select(
        "_id",
        F.explode_outer("_hsh").alias("_e"),
    ).select("_id", F.col("_e").bitwiseAND(F.lit(0x7FFFFFFF)).alias("_h"))
    aggs = [
        F.min(
            F.pmod(F.lit(a_list[i]) * F.col("_h") + F.lit(b_list[i]), F.lit(_MERSENNE_31))
        ).alias(f"_m{i}")
        for i in range(num_hashes)
    ] + [F.count("_h").alias("_nh")]
    sig = hashed.groupBy("_id").agg(*aggs)
    return sig.select(
        "_id",
        F.when(F.col("_nh") == 0, F.lit(None)).otherwise(
            F.array(*[F.col(f"_m{i}") for i in range(num_hashes)])
        ).alias("_sig"),
    )


def minhash_signatures_agg(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(_id, _sig) via explode + hash aggregate — value-identical to
    ``minhash_signature`` (same affine family over the same shingle
    hashes; the pinned fixture gates both), different physical shape:
    the higher-order-function fold is interpreted per array element with
    a fresh accumulator array per step, while this form keeps the k
    min() columns inside whole-stage codegen with MAP-SIDE partial
    aggregation. Measured 2x+ on the 1M-doc bench leg; at 100 TB the
    partial agg is also the right shuffle shape."""
    return _signatures_from_hashed(
        hashed_shingles(docs, id_col, text_col, shingle_n), num_hashes
    )


def cap_lsh_buckets(banded: DataFrame, max_bucket_size: int, keys=("band", "bhash")) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket_size`` BEFORE the
    self-join. A degenerate bucket (boilerplate/empty docs sharing a band
    hash) otherwise produces O(bucket^2) pairs — the 100 TB job-killer.
    One window count over the same (band, bhash) partitioning the join
    shuffles on anyway, so no extra shuffle stage at scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )


def lsh_dropped_bucket_stats(banded: DataFrame, max_bucket_size: int, keys=("band", "bhash")):
    """Report what a cap would drop: (n_buckets_dropped, n_rows_dropped).
    Kept separate from the lazy pipeline so the cap itself never forces an
    action; call from bench/ops when drop-volume logging is wanted."""
    big = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter(F.col("_bsz") > max_bucket_size)
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.coalesce(F.sum("_bsz"), F.lit(0)).alias("n_rows"),
        )
        .first()
    )
    return int(big["n_buckets"]), int(big["n_rows"])


def banded_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(_id, band, bhash) banded MinHash rows — the pre-cap frame of the
    LSH pipeline, exported so ops/tests can measure bucket-size drop
    volume (lsh_dropped_bucket_stats) on EXACTLY the frame the candidate
    join consumes."""
    sigs = minhash_signatures_agg(docs, id_col, text_col, num_hashes, shingle_n)
    return _banded_from_sigs(sigs, num_hashes, bands)


def _banded_from_sigs(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    rows_per_band = num_hashes // bands
    return sigs.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("_sig", b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bhash"),
                ),
            )
        ).alias("bb"),
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    rows/band = num_hashes/bands; docs sharing any band hash collide.
    Returns (id_a, id_b, n_bands_shared) with id_a < id_b. Buckets larger
    than ``max_bucket_size`` are dropped before the self-join (use
    ``lsh_dropped_bucket_stats`` to measure the dropped volume); true
    giant dup-clusters are the exact-dedup pass's job, not LSH's.
    """
    banded = banded_signatures(
        docs, id_col, text_col, num_hashes, bands, shingle_n
    )
    return _pairs_from_banded(cap_lsh_buckets(banded, max_bucket_size))


def _pairs_from_banded(banded: DataFrame) -> DataFrame:
    """Capped banded rows -> candidate pairs. The banded frame feeds BOTH
    sides of the self-join but the two sides differ by an alias, so the
    planner cannot reuse one exchange between them — without pinning, the
    whole signature pipeline (shingle + hash + 32-way agg + cap window)
    executes TWICE (measured: 8 scans / 13 exchanges / 0 reuse in the
    1M-doc verify plan). Eager-materializing the small (_id, band, bhash)
    frame makes each side a checkpoint scan. NB this makes the builder
    eager at plan-construction time, like connected_components."""
    banded = banded.localCheckpoint(eager=True)
    l = banded.select(F.col("_id").alias("id_a"), "band", "bhash")
    r = banded.select(F.col("_id").alias("id_b"), "band", "bhash")
    pairs = (
        l.join(r, on=["band", "bhash"], how="inner")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands_shared"))
    )
    return pairs


def minhash_verified_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    **lsh_kw,
) -> DataFrame:
    """LSH candidates -> exact Jaccard verify within buckets. Returns the
    verified near-dup EDGE LIST (id_a, id_b, jaccard), id_a < id_b.

    The verify compares HASHED shingle sets (one xxhash64 per distinct
    shingle, computed once per doc): Jaccard over 64-bit hashes equals
    Jaccard over the strings up to a ~n²/2^65 per-pair collision
    probability (~1e-16 at 100-shingle docs) — and the candidate-pair
    join then moves 8-byte elements instead of whole n-gram strings and
    intersects ints instead of strings. Measured on the 30M-pair 1M-doc
    bench corpus: 312 s -> 77 s for the verify stage.

    Round-6 shape: ONE hashed-shingle pass feeds both the signature
    pipeline (low 31 bits) and the verify arrays — previously the corpus
    was shingled twice. The two attach joins are BYTE-GATED broadcasts of
    the per-doc array table (same gate pattern as the gazetteer index):
    under the budget both attaches and the Jaccard compute fuse into ONE
    stage of the pair stream with ZERO array shuffles — the profiled
    alternative exchanges every pair row WITH its first attached array
    (13 GB written + read at the 30M-pair bench corpus, 2,550 core-s —
    5x the intersect work itself). Above the budget (a corpus whose
    array table outgrows executor memory) the joins fall back to
    SHUFFLE_HASH with the array side as build: no sort of the pair
    stream, per-partition hash builds only. |A∪B| is computed as
    |A|+|B|−|A∩B| (one hash-set pass instead of two; equal to
    size(array_union) because each doc's hashes are distinct up to the
    same 2^-64 collision caveat)."""
    shingle_n = lsh_kw.pop("shingle_n", 3)
    num_hashes = lsh_kw.pop("num_hashes", 32)
    bands = lsh_kw.pop("bands", 8)
    max_bucket_size = lsh_kw.pop("max_bucket_size", 500)
    broadcast_max_bytes = lsh_kw.pop("broadcast_max_bytes", 800 * 1024 * 1024)
    if lsh_kw:
        raise TypeError(f"unknown lsh kwargs: {sorted(lsh_kw)}")
    hs = hashed_shingles(docs, id_col, text_col, shingle_n).localCheckpoint(eager=True)
    cand = _pairs_from_banded(
        cap_lsh_buckets(
            _banded_from_sigs(_signatures_from_hashed(hs, num_hashes), num_hashes, bands),
            max_bucket_size,
        )
    )
    # measured-size broadcast gate: one cheap agg over the checkpointed
    # array table (id long + n_shingles * 8B + array/row overhead)
    stats = hs.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("_hsh")).alias("w")
    ).first()
    est_bytes = int((stats["n"] or 0) * (float(stats["w"] or 0) * 8 + 32))
    use_broadcast = est_bytes <= broadcast_max_bytes
    # restore the raw-xxhash64 value for NULL shingles (xxhash64(NULL) is
    # the seed, 42) so the arrays are byte-identical to hashing the
    # shingle strings directly
    unmask = F.transform("_hsh", lambda h: F.coalesce(h, F.lit(42).cast("long")))
    sh_a = hs.select(F.col("_id").alias("id_a"), unmask.alias("sh_a"))
    sh_b = hs.select(F.col("_id").alias("id_b"), unmask.alias("sh_b"))
    if use_broadcast:
        sh_a, sh_b = F.broadcast(sh_a), F.broadcast(sh_b)
    else:
        sh_a, sh_b = sh_a.hint("shuffle_hash"), sh_b.hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", inter / F.greatest(union, F.lit(1)))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.8,
    **lsh_kw,
) -> DataFrame:
    """Full near-dup dedup: LSH candidates -> exact Jaccard verify within
    buckets -> CONNECTED-COMPONENT keep-lowest-id rule. The verified pair
    set is a graph whose transitive closure defines the dup clusters;
    exactly the component-minimum doc survives each cluster (a single-hop
    "drop if any lower-id near-identical neighbor" rule over-keeps on
    chain-shaped clusters — see operators/components.py docstring)."""
    from .components import connected_components

    verified = minhash_verified_pairs(
        docs, id_col, text_col, jaccard_threshold, **lsh_kw
    )
    comp = connected_components(verified, src="id_a", dst="id_b")
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_np(texts) -> "np.ndarray":
    """64-bit SimHash per text as int64 numpy — the kernel both the Spark
    UDF and the pinned-fixture generator call, so the driver oracle pins
    exactly what production computes."""
    import numpy as np

    from ..functions.text import fnv1a_64

    cache: dict[str, int] = {}
    shifts = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for n, t in enumerate(texts):
        if not t:
            continue
        toks = t.split()
        hs = np.fromiter(
            (cache.setdefault(w, fnv1a_64(w.encode("utf-8"))) for w in toks),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out[n] = np.int64(sig.astype(np.int64))
    return out


def simhash_udf():
    """64-bit SimHash as an Arrow-batched pandas UDF (numpy bit-matrix
    majority vote with per-batch token-hash caching — a 64-pass Column
    aggregate would re-walk the token array per bit, so the UDF is the
    faster path here)."""
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _simhash(text):  # no hints: local-scope 'pd' breaks hint inference
        return pd.Series(simhash_np(text.tolist()))

    return _simhash


def hamming64_col(a, b):
    """Hamming distance between two int64 SimHash columns — pure bit math
    (bit_count of xor), JVM-side."""
    return F.bit_count(a.bitwiseXOR(b))
