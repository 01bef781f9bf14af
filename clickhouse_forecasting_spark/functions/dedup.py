"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (BASELINE.json extension surface).

Scale design (the whole point of these at 100 TB):

- **exact**: one hash-groupBy on a 32-byte fingerprint — the shuffle carries
  (fingerprint, doc_id), never the text. Canonical-keeper = min(doc_id).
- **minhash_lsh**: shingle -> k md5-minima signature -> band keys ->
  self-join *on band key only*. Candidate pairs are generated per-bucket, so
  the join is an equi-join Catalyst can shuffle-hash; no O(n²) cross join
  ever materializes. Band/row parameters trade recall vs candidate volume.
- **simhash**: per-doc 32-bit signature via per-bit majority vote over token
  hashes — computed row-local with array expressions (no shuffle), then
  grouped on the signature (near-dups collide exactly or at small Hamming
  distance via rotated bands).
- **ngram_jaccard**: exact verification join — explode distinct shingles,
  equi-join on shingle, count common / union. Used to verify LSH candidates
  (or alone at small scale); the explode keys are md5-hashed shingles so
  shuffle rows stay narrow.
- **embedding near-dup**: cosine over `array<float>` with JVM-side
  `aggregate`/`zip_with`; pair generation via LSH-ish bucketing or an
  id-sampled blocklist at verification time.

Every operator uses only built-in functions (md5, array lambdas), keeping an
exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import char_shingles, char_shingles_of_norm, fingerprint, normalize_text, tokens


def _exploded_shingles(
    df: DataFrame, text_col: str, id_col: str, shingle_size: int
) -> DataFrame:
    """(id, shingle) rows with the normalization materialized once per doc
    (a separate projection under the Generate node), not once per element.

    Deliberately explodes the per-doc shingle ARRAY rather than an offset
    sequence: exploding offsets first would duplicate the full normalized
    string into every offset row (~60x the bytes through the Generate node)
    before the substring projection — measured 3-5x slower than paying the
    interpreted per-element substring inside the array transform."""
    base = df.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("_norm")
    )
    return base.select(
        F.col(id_col),
        F.explode(char_shingles_of_norm(F.col("_norm"), shingle_size)).alias("sh"),
    )

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (normalized) documents with >1 member.

    Returns (fp, n_docs, keeper_id): keeper = min id, the deterministic
    canonical representative. Shuffle carries only (fp, id)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct normalized text — the actual
    drop-duplicates pass a training pipeline runs."""
    w_fp = df.withColumn("fp", fingerprint(F.col(text_col)))
    keepers = w_fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return w_fp.join(keepers, ["fp", id_col], "inner").drop("fp")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as an array of md5-minima (array-column form).

    hash_i(s) = md5(i || s); the signature element i is the minimum over the
    document's shingles — the classic permutation-free MinHash construction.
    md5 hex strings compare lexicographically identically in any engine,
    which keeps the DuckDB twin exact.

    NOTE: nested higher-order functions are interpreted (not codegen'd) and
    re-evaluate the shingle subtree once per hash index — fine for small k,
    but the scale path is :func:`minhash_signatures` (explode + groupBy),
    which hashes each shingle exactly once inside whole-stage codegen."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.md5(F.concat(i.cast("string"), s)))
        ),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-doc MinHash signature as columns sig_0..sig_{k-1} — the scale path.

    explode(shingles) -> one md5 per (doc, shingle, hash-index) -> groupBy-min.
    Everything is built-in + codegen'd; the shuffle carries (id, k mins) after
    partial aggregation, so network volume is O(docs * k), never O(shingles).
    Values are identical to :func:`minhash_signature` (min over md5(i||s))."""
    sh = _exploded_shingles(df, text_col, id_col, shingle_size)
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(i)), F.col("sh")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Split a signature into band keys: array of (band_id || joined rows).
    Docs sharing any band key become candidate pairs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit("|"),
            F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band)),
        ),
    )


# Hash family for the numeric MinHash: h_i(x) = (a_i*x + b_i) mod P, with
# x = the low 60 bits of md5(shingle) reduced mod P. P = 2^31 - 1 (Mersenne
# prime); (P-1)^2 < 2^62 so products never overflow int64, and the identical
# arithmetic runs in any engine (the DuckDB twin transliterates the same
# literal a_i/b_i). The multipliers must be large & well-mixed: with small
# a_i, every h_i is minimized by the same low-x shingle and the signature
# rows collapse (bands lose all selectivity).
MINHASH_PRIME = 2147483647
_KNUTH = 2654435761  # Knuth's multiplicative-hash constant


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, a_i ∈ [1, P-1], b_i ∈ [0, P-1]."""
    p = MINHASH_PRIME
    out = []
    for i in range(num_hashes):
        a = (_KNUTH * (2 * i + 1)) % p
        b = (_KNUTH * _KNUTH % p * (i + 1) + 12345) % p
        out.append((a if a else 1, b))
    return out


# Session-scoped cache of persisted intermediate stages shared by the
# dedup family (VERDICT r1 #6): the banded-signature frame and the
# shingle-set frame are each ONE corpus pass, and four registry queries
# (lsh_pairs, ngram_jaccard, near_projection, components) consume them.
# Keyed by (spark application id, caller token, params) so a cached frame
# never outlives its session; at 100 TB the same role is played by a
# persisted bucket table. Opt-in via cache_key (e.g. the sf_dir). Since
# r9 the store is the package-wide runtime_cache registry, so
# runtime_cache.release(cache_key) drops every stage built from a corpus.
from ..runtime_cache import cached_frame as _cached_stage  # noqa: E402


def numeric_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    num_hashes: int = 16,
    cache_key=None,
) -> DataFrame:
    """(id, h0..h{k-1}) numeric MinHash signature frame — the un-banded
    signature table (what a 100 TB pipeline would materialize once and
    index many ways). explode shingles -> ONE md5 per (doc, shingle),
    k multiply-mod hashes derived from it -> partial-aggregated
    groupBy-min, so the shuffle carries docs*k longs, never shingles.
    Cached per (session, params) like the other family stages; the
    banded index and the estimator-quality audit both read it."""

    def _build() -> DataFrame:
        p = F.lit(MINHASH_PRIME)
        sh = _exploded_shingles(df, text_col, id_col, shingle_size)
        x = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long") % p
        params = minhash_params(num_hashes)
        hashed = sh.select(
            F.col(id_col),
            *[((F.lit(a) * x + F.lit(b)) % p).alias(f"h{i}") for i, (a, b) in enumerate(params)],
        )
        return hashed.groupBy(id_col).agg(
            *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
        )

    key = None
    if cache_key is not None:
        key = ("numsig", cache_key, text_col, id_col, shingle_size, num_hashes)
    return _cached_stage(df, key, _build)


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    cache_key=None,
) -> DataFrame:
    """(id, band-key) frame — the LSH index build pass.

    Reads the (cached) numeric signature stage and explodes b band keys.
    With cache_key set both stages persist and are shared across the
    dedup family — one corpus pass per run, not one per query."""
    if bands < 1 or num_hashes % bands != 0:
        # bands > num_hashes would make every band key degenerate (all docs
        # collide -> O(n^2)); a non-dividing bands would silently drop the
        # remainder hashes. Both are configuration errors, not choices.
        raise ValueError(
            f"bands ({bands}) must be >= 1 and divide num_hashes ({num_hashes})"
        )

    def _build() -> DataFrame:
        rows_per_band = num_hashes // bands
        sig = numeric_signatures(
            df, text_col, id_col, shingle_size, num_hashes, cache_key
        )
        band_keys = F.array(
            *[
                F.concat_ws(
                    ",",
                    F.lit(str(b)),
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
                for b in range(bands)
            ]
        )
        return sig.select(F.col(id_col), F.explode(band_keys).alias("band"))

    key = None
    if cache_key is not None:
        key = ("banded", cache_key, text_col, id_col, shingle_size, num_hashes, bands)
    return _cached_stage(df, key, _build)


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    cache_key=None,
) -> DataFrame:
    """(id, shingle-set) frame — the exact-verification side. Cached the
    same way as banded_signatures (both verify joins of a family run read
    it twice each)."""

    def _build() -> DataFrame:
        return df.select(
            F.col(id_col), normalize_text(F.col(text_col)).alias("_norm")
        ).select(
            F.col(id_col),
            char_shingles_of_norm(F.col("_norm"), shingle_size).alias("sh_set"),
        )

    key = None
    if cache_key is not None:
        key = ("sets", cache_key, text_col, id_col, shingle_size)
    return _cached_stage(df, key, _build)


# In-plan hard bound on LSH band-bucket occupancy. One degenerate band key
# (near-constant docs, a shingle-starved corpus, or a misconfigured r) puts
# n docs in one bucket and n² rows through the self-join — the quadratic
# failure LSH exists to avoid. Past this bound the candidate join REFUSES to
# produce rows (assert_true raises at run time) instead of silently running
# the blow-up; the remedy is more rows-per-band, a pre-split on an exact
# fingerprint (exact dups don't need LSH), or sharding the hot bucket.
# Mirrors the SemDeDup cluster bound (queries.py q_semdedup_clusters).
MAX_BAND_OCCUPANCY = 10_000


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    cache_key=None,
    max_band_occupancy: int = MAX_BAND_OCCUPANCY,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >=1 LSH band.

    Self-equi-join on the band key (shuffle-hash; never a cross join) of
    ONE guarded frame: both join sides are the identical plan — the
    occupancy window plus guard projection — so Spark reuses a single
    exchange in the uncached path (and a single persisted stage when
    cache_key is set) rather than computing/shuffling the banded
    signatures twice.  With b bands of r rows the collision probability of
    a pair with Jaccard j is 1-(1-j^r)^b (b=4, r=4: ~0.97 at j=0.8,
    ~0.04 at j=0.3).

    The guard: a per-band occupancy count (a window over the same band
    partitioning the join shuffles on — no extra exchange) feeds an
    in-plan assert_true capping it at ``max_band_occupancy``: a degenerate
    hot bucket fails loudly before emitting its n² candidate rows."""
    banded = banded_signatures(
        df, text_col, id_col, shingle_size, num_hashes, bands, cache_key
    )

    def build() -> DataFrame:
        return _lsh_candidates_from_banded(
            banded, id_col, max_band_occupancy
        )

    # r8: the candidate stage itself joins the family cache — the scale
    # audit (and any consumer pairing a candidate count with verification)
    # was paying the band self-join + DISTINCT twice per run. O(n) rows by
    # the measured linear-growth law; at 100 TB this is the materialized
    # candidate table every dedup pipeline persists anyway.
    key = None
    if cache_key is not None:
        key = (
            "cand", cache_key, text_col, id_col, shingle_size,
            num_hashes, bands, int(max_band_occupancy),
        )
    return _cached_stage(banded, key, build)


def _lsh_candidates_from_banded(
    banded: DataFrame, id_col: str, max_band_occupancy: int
) -> DataFrame:
    occ = F.count("*").over(Window.partitionBy("band"))
    guarded_band = F.when(
        F.assert_true(
            F.col("__band_occ") <= F.lit(int(max_band_occupancy)),
            F.lit(
                "LSH band bucket exceeds the %d-doc occupancy bound "
                "(degenerate band — raise rows-per-band or pre-split "
                "exact duplicates)" % int(max_band_occupancy)
            ),
        ).isNull(),
        F.col("band"),
    )
    guarded = banded.withColumn("__band_occ", occ).select(
        guarded_band.alias("band"), F.col(id_col)
    )
    return (
        guarded.alias("a").join(guarded.alias("b"), "band")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    cache_key=None,
) -> DataFrame:
    """Near-dup pairs: LSH candidate generation + exact Jaccard verification.

    This is the 100 TB dedup pipeline: an all-pairs shingle join never runs.
    Verification joins the candidate pairs back to the per-doc shingle SETS
    (two equi-joins on id) and computes |A∩B| row-locally with
    array_intersect — cost is O(candidate pairs), independent of corpus
    size, and immune to hot stop-shingles (which blow up any shingle-keyed
    self-join: a shingle shared by n docs contributes n² join rows)."""
    cand = minhash_lsh_candidates(
        df, text_col, id_col, shingle_size, num_hashes, bands, cache_key
    )
    sets = shingle_sets(df, text_col, id_col, shingle_size, cache_key)
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("sh_b"))
    common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            common / (F.size("sh_a") + F.size("sh_b") - common),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold_ppm: int = 600_000,
    cache_key=None,
) -> DataFrame:
    """Containment near-dup pairs: doc-inside-doc detection Jaccard misses.

    A short doc quoted verbatim inside a long one has tiny Jaccard (the
    union is dominated by the long doc) but containment |A∩B|/|A| ≈ 1.
    Candidate generation is the SAME LSH band join as the Jaccard family
    (shares the persisted banded-signature + shingle-set stages when
    cache_key is set — zero extra corpus passes); only the verification
    formula differs. Both directions are emitted as exact integer ppm
    (common * 1e6 div |side|), and the pair is kept when either direction
    clears ``threshold_ppm``. ``contained`` labels the more-contained side.

    Scale: cost is O(LSH candidate pairs), independent of corpus size —
    identical profile to lsh_verified_pairs. Note the LSH recall bias:
    bands are tuned for Jaccard, so an extreme containment pair with low
    Jaccard may not collide; raising num_hashes/bands (or banding on the
    short side's signature only) trades cost for recall.
    """
    cand = minhash_lsh_candidates(
        df, text_col, id_col, shingle_size, num_hashes, bands, cache_key
    )
    sets = shingle_sets(df, text_col, id_col, shingle_size, cache_key)
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("sh_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("sh_b"))
    common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("common", common.cast("bigint"))
        .withColumn(
            "cont_a_in_b_ppm",
            F.expr("common * 1000000 div size(sh_a)").cast("bigint"),
        )
        .withColumn(
            "cont_b_in_a_ppm",
            F.expr("common * 1000000 div size(sh_b)").cast("bigint"),
        )
        .filter(
            F.greatest("cont_a_in_b_ppm", "cont_b_in_a_ppm") >= F.lit(threshold_ppm)
        )
        .withColumn(
            "contained",
            F.when(
                F.col("cont_a_in_b_ppm") >= F.col("cont_b_in_a_ppm"), F.lit("a_in_b")
            ).otherwise(F.lit("b_in_a")),
        )
        .select("id_a", "id_b", "cont_a_in_b_ppm", "cont_b_in_a_ppm", "contained")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact verification)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shingle equi-join.

    explode(distinct shingles) -> join on shingle -> |A∩B| per pair ->
    jaccard = common / (|A| + |B| - common). Shuffle rows are (md5(shingle),
    id): narrow and uniformly distributed, so the join parallelizes cleanly;
    hot shingles (stop-phrases) are the skew risk — AQE skew-join splits
    them. Returns (id_a, id_b, jaccard >= threshold)."""
    sh = df.select(
        F.col(id_col),
        F.explode(char_shingles(F.col(text_col), shingle_size)).alias("sh"),
    ).withColumn("sh", F.md5(F.col("sh")))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "sh")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over an undirected pair list (id_a, id_b) —
    label propagation to the component's MIN id. The iterative-algorithm
    upgrade of dedup_near's greedy pairwise rule: transitive chains
    (A~B~C where A!~C) all land in one component.

    Each iteration is one join + one groupBy-min, moving the min label
    ONE hop per round — iteration count is O(cluster diameter), which is
    fine for near-dup clusters (tiny diameters in practice) but stalls
    on pathological long chains; the O(log n)-round scale path for those
    is operators/graph.connected_components_star (same answer,
    hash-gated equal by the dedup_components_star registry row). The
    driver only checks a convergence flag per iteration — labels never
    leave the cluster. Returns (id, component) for every id appearing
    in pairs."""
    from pyspark import StorageLevel

    # the edge list is re-joined EVERY iteration — persist it once so the
    # upstream pair derivation (LSH candidate + verify joins) runs a
    # single time instead of once per round
    # symmetrize via ONE explode (r11, guide §1.3): the union-of-two-
    # selects form executed the upstream pair derivation (LSH candidate
    # + verify joins) twice inside the persist's materialization job
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                    ),
                    F.struct(
                        F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                    ),
                )
            ).alias("p")
        )
        .select("p.src", "p.dst")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src")
                .agg(F.min("component").alias("nbr_component"))
            )
            updated = (
                labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"), F.coalesce("nbr_component", "component")
                    ).alias("component"),
                    (
                        F.coalesce("nbr_component", "component") < F.col("component")
                    ).alias("_changed"),
                )
            )
            updated = updated.localCheckpoint(eager=True)  # truncate lineage per iteration
            converged = updated.filter(F.col("_changed")).isEmpty()
            labels = updated.drop("_changed")
            if converged:
                break
        else:
            # r4 hardening (found by the star-CC equivalence test): a
            # graph whose diameter exceeds the round budget used to
            # return silently-WRONG unconverged labels. Fail loudly and
            # name the logarithmic alternative.
            raise ValueError(
                f"connected_components did not converge in {max_iterations} "
                "rounds (cluster diameter exceeds the budget); use "
                "operators.graph.connected_components_star, which "
                "converges in O(log n) rounds"
            )
    finally:
        edges.unpersist()
    return labels


def dedup_near(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    cache_key=None,
) -> DataFrame:
    """The end-to-end near-dedup projection a training pipeline ships:
    corpus minus near-duplicates. A doc is dropped iff some verified pair
    links it to a lower-id doc — the min-id member of every duplicate
    cluster survives (pairwise rule; transitive chains keep any member
    that has no lower-id partner, the standard greedy approximation that
    avoids an iterative connected-components pass)."""
    pairs = lsh_verified_pairs(
        df, text_col, id_col, shingle_size, num_hashes, bands, threshold, cache_key
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "left_anti")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def _token_hash32(tok: Column) -> Column:
    """Deterministic 32-bit token hash from md5 (engine-portable)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash32(text_col: Column) -> Column:
    """32-bit SimHash over word tokens, fully row-local (no shuffle).

    For each bit position, majority vote of the token hashes' bit values:
    bit = 1 if sum over tokens of (2*bit_i - 1) > 0. Near-identical docs get
    identical or near-identical signatures (small Hamming distance)."""
    toks = tokens(text_col)
    hashes = F.transform(toks, _token_hash32)
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(31)),
        lambda i: F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.floor(h / F.pow(F.lit(2.0), i.cast("double")).cast("long")) % 2 == 1, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(31)),
            lambda v, i: F.when(v > 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc 32-bit SimHash — the scale path (explode + codegen'd groupBy).

    Value-identical to :func:`simhash32` (same md5-derived token hashes,
    same majority vote), but the per-bit votes are 32 SUM aggregates over
    exploded tokens instead of nested interpreted array lambdas: partial
    aggregation means the shuffle carries 32 longs per doc. Docs with no
    tokens get simhash 0 (explode_outer keeps them; NULL tokens vote 0)."""
    tok = df.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("tok")
    ).select(
        # materialize the md5-derived hash ONCE per token row; referencing
        # the md5 expression from all 32 vote aggregates would re-hash 32x
        F.col(id_col),
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.col("h").isNull(), 0).otherwise(
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            )
        ).alias(f"v{i}")
        for i in range(32)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(32):
        term = F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Docs sharing an identical 32-bit SimHash (strong near-dup signal)."""
    return (
        df.select(F.col(id_col), simhash32(F.col(text_col)).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_docs") > 1)
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------


def cosine_similarity(a: Column, b: Column) -> Column:
    """JVM-side cosine over two array<float/double> columns: zip_with dot
    product + per-array norms via aggregate. No Python in the loop."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_mod: int | None = None,
) -> DataFrame:
    """Pairs with cosine >= threshold.

    Brute-force path (block_mod=None) is O(n²) — verification-scale only.
    With block_mod, ids are restricted to a deterministic 1/block_mod sample
    (id % block_mod == 0): the pattern for spot-audits at scale. The scale
    path for full corpora is similarity.hyperplane_lsh_candidates."""
    base = df.select(F.col(id_col), F.col(vec_col))
    if block_mod:
        base = base.filter(F.col(id_col) % block_mod == 0)
    # per-vector norm computed once before the pair join (identical fold
    # to cosine_similarity's — dot/(na·nb) is bit-identical, 1 fold per
    # pair instead of 3)
    nrm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    base = base.withColumn("__nrm", nrm)
    a = base.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("__nrm").alias("__na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("__nrm").alias("__nb"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("va"), F.col("vb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("__na") * F.col("__nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
