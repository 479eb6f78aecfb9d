"""Deduplication operators for training-data pipelines.

Four tiers, cheapest-first, as a 100 TB corpus demands:

1. exact         — hash-groupBy on a canonical fingerprint (one shuffle);
2. MinHash + LSH — near-dup candidate pairs without the O(n²) cross join:
                   shingle → k min-hashes → band → bucket equi-join;
3. SimHash       — 32-bit locality-sensitive bit signature (hamming buckets);
4. n-gram Jaccard — exact verification on candidate pairs only.

All signature math is built-in expressions (``F.hash`` is Murmur3 on the JVM);
Python never touches row data, so each stage is a scan + one keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfns import normalize_text, shingles_of, tokens


def fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of normalized text."""
    return F.md5(normalize_text(text))


#: Mersenne prime 2^31-1 — the shared modulus of every hash family here.
MINHASH_P = 2147483647


def token_hash_expr(tok: Column, mode: str = "xxhash64",
                    bits: int = 60) -> Column:
    """Per-token integer hash in [0, 2^bits).

    ``xxhash64`` is the fast JVM-native default.  ``md5`` takes the first
    ``bits``/4 hex chars of the md5 digest — slower, but md5 is the one
    hash every SQL engine computes bit-identically, so md5 mode makes the
    entire MinHash/SimHash pipeline reproducible in DuckDB/Trino/Snowflake
    for cross-engine verification (the CORRECTNESS oracle runs it in
    DuckDB as ``('0x' || substring(md5(t), 1, k))::BIGINT``)."""
    if mode == "xxhash64":
        return F.xxhash64(tok)
    if mode == "md5":
        return F.conv(F.substring(F.md5(tok), 1, bits // 4), 16, 10).cast("long")
    raise ValueError(f"unknown token hash mode: {mode}")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-identity dedup: keep the lowest id per normalized-text
    fingerprint.  One hash-aggregate shuffle on the fingerprint — the 100 TB
    path (no sort, no window over the whole corpus)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_hashes: int = 32, shingle_n: int = 3,
                       token_hash: str = "xxhash64") -> DataFrame:
    """Per-document MinHash signature as ``array<int>`` of length num_hashes.

    Each hash family member is ``murmur3(shingle, seed=i)`` via ``F.hash``
    with a per-family salt column; the min over the shingle array is an
    ``array_min(transform(...))`` — all codegen, zero shuffles (signature
    computation is embarrassingly parallel per document).
    """
    # Signature math is CPU-bound per document (num_hashes passes over the
    # shingle-hash array).  A small source file arrives as ONE input split, so
    # without a rebalance every core but one idles — measured 4× end-to-end
    # on local[32].  At real scale the input already has >= parallelism
    # splits and this is a no-op.
    from ..catalog import spread
    df = spread(df)
    # one xxhash64 per TOKEN (not per shingle string), then each shingle hash
    # is a rolling polynomial over the n token hashes — no per-shingle string
    # concat/alloc/hash (measured ~25% off the signature stage), and
    # array_distinct drops repeated shingles before the 32 min-passes (dups
    # cannot change a min).  All values stay < 2^52 so ANSI mode is happy.
    # tokens → token-hashes → shingle-hashes are STAGED projections: each
    # alias is consumed multiple times by the next stage, which blocks
    # CollapseProject from inlining the regex work into per-element lambda
    # bodies (see shingles_of docstring).
    p = 2147483647  # Mersenne prime 2^31-1
    coef = [1000003, 8191, 524287, 131071, 97][:shingle_n]
    if shingle_n > len(coef):
        coef = [1000003 + 2 * k for k in range(shingle_n)]

    def roll(i):
        s = F.element_at("_th", i) * F.lit(coef[0])
        for k in range(1, shingle_n):
            s = s + F.element_at("_th", i + F.lit(k)) * F.lit(coef[k])
        return F.pmod(s, F.lit(p))

    if token_hash == "md5":
        # md5's hex→int chain inside a transform() lambda is interpreted
        # per ELEMENT (no codegen, measured 139s vs 3s at sf0.1) — so md5
        # mode explodes tokens into rows, hashes them in a whole-stage-
        # codegen projection, and reassembles the per-doc hash array with
        # ONE groupBy(id) shuffle.  The xxhash64 default keeps the
        # zero-shuffle in-row path; this is the verifiability tradeoff.
        hashed = (
            df.select(F.col(id_col),
                      F.posexplode_outer(tokens(text_col)).alias("_pos", "_t"))
            .select(F.col(id_col), "_pos",
                    F.pmod(token_hash_expr(F.col("_t"), "md5"),
                           F.lit(p)).alias("_h"))
        )
        token_arrays = (
            hashed.groupBy(id_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_h"))),
                lambda x: x["_h"]).alias("_th"))
        )
    else:
        token_arrays = (
            df.select(F.col(id_col), tokens(text_col).alias("_ws"))
            .select(F.col(id_col),
                    F.transform("_ws", lambda t: F.pmod(
                        token_hash_expr(t, token_hash), F.lit(p)))
                     .alias("_th"))
        )
    base = (
        token_arrays
        .select(
            F.col(id_col),
            F.array_distinct(
                F.when(F.size("_th") >= shingle_n,
                       F.transform(
                           F.sequence(F.lit(1),
                                      F.size("_th") - (shingle_n - 1)),
                           roll))
                .otherwise(F.array().cast("array<long>"))).alias("_hs"))
    )
    # ONE aggregate pass over the shingle hashes with a num_hashes-slot
    # accumulator: acc[i] = least(acc[i], (h*a_i + b_i) mod p).  Same affine
    # family as the previous 32×array_min(transform(...)) formulation and
    # bit-identical output, but the generated code is one aggregate loop
    # instead of 32 unrolled array scans — measured 4.2s→2.9s cold
    # (Janino compile dominates the unrolled form) and 1.6s→0.8s warm at
    # sf0.1.  Docs with no shingles keep the old null-signature contract.
    a_arr = F.array(*[F.lit(2 * i + 1).cast("long") for i in range(num_hashes)])
    b_arr = F.array(*[F.lit(i * 98765431).cast("long") for i in range(num_hashes)])
    m = F.lit(p).cast("long")
    folded = F.aggregate(
        "_hs", F.array_repeat(m, num_hashes),
        lambda acc, h: F.zip_with(
            acc, F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda cur, i: F.least(
                cur,
                F.pmod(h * F.element_at(a_arr, i + 1)
                       + F.element_at(b_arr, i + 1), m))))
    sig = F.when(F.size("_hs") > 0, folded).otherwise(
        F.array_repeat(F.lit(None).cast("long"), num_hashes))
    return base.select(F.col(id_col), sig.alias("minhash"))


def _band_buckets(sig_df: DataFrame, id_col: str, bands: int,
                  rows_per_band: int, band_hash: str) -> DataFrame:
    """(id, band, band_hash) bucket rows for LSH banding — shared by the
    one-shot pair generator and the incremental store join."""
    def bucket_of(b):
        slots = [F.col("minhash")[b * rows_per_band + r]
                 for r in range(rows_per_band)]
        if band_hash == "murmur3":
            # one multi-arg murmur3 over the band's minhash slots — no
            # per-slot string casts/concat (smaller codegen, less alloc)
            return F.hash(*slots)
        # "poly": rolling polynomial mod MINHASH_P — pure arithmetic, so the
        # DuckDB oracle reproduces buckets exactly (slots < 2^31, ×1000003
        # stays < 2^52: no overflow either side).  A collision only merges
        # buckets, which the verify stage corrects.
        h = slots[0]
        for s in slots[1:]:
            h = F.pmod(h * F.lit(1000003) + s, F.lit(MINHASH_P))
        return h

    return sig_df.select(
        F.col(id_col),
        F.posexplode(F.array(*[bucket_of(b) for b in range(bands)])
                     ).alias("band", "band_hash"),
    )


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str,
                        bands: int = 8,
                        num_hashes: int | None = None,
                        max_bucket_size: int | None = 500,
                        band_hash: str = "murmur3",
                        hot_buckets: str = "drop") -> DataFrame:
    """LSH banding: split each signature into ``bands`` bands, hash each band,
    and equi-join documents sharing any (band, band_hash) bucket.

    The join is on the bucket key — at 100 TB this is the step that replaces
    the O(n²) cross join with a skew-manageable shuffle.  One
    boilerplate-heavy bucket of m docs yields m²/2 pairs, so a single hot
    bucket can dominate the whole job; buckets larger than
    ``max_bucket_size`` are handled per ``hot_buckets`` (pass
    ``max_bucket_size=None`` to disable the cap):

    - ``"drop"``: discard the bucket before the pair stage.  Cheapest; docs
      in such a bucket usually share other, smaller buckets through their
      remaining bands — but a pathological corpus (mass boilerplate whose
      signatures collide in EVERY band) silently loses its pairs.
    - ``"chain"`` (VERDICT r4 item 10): deterministic overlapping chunking —
      members are ``row_number``-ordered by id inside the bucket, split into
      chunks of ``max_bucket_size``, and each chunk boundary member also
      joins the previous chunk.  Pair volume per bucket drops from O(m²) to
      O(m·cap) — a hard linear bound — while the overlap chains every chunk
      to the next, so the bucket's members remain CONNECTED in the pair
      graph: connected-components clustering over chained candidates equals
      the uncapped reference exactly (any uncapped edge implies a shared
      bucket, and chaining connects all of that bucket's members), asserted
      by test.  The chunk key narrows the existing window partitioning, so
      no extra shuffle is introduced.

    Candidate generation is ONE keyed shuffle: the banded rows are hashed to
    their ``(band, band_hash)`` bucket once; a window ``count`` over that key
    sizes each bucket, oversized buckets are dropped, and the surviving rows
    feed ``groupBy(...).collect_list(id)`` + an in-row pair explosion — the
    groupBy reuses the window's exchange (same key), so no second shuffle and
    no bucket self-join (which would shuffle both sides and hash-probe).  The
    size filter runs BEFORE collect_list, so a pathological bucket streams
    through the window sort (disk-spillable) and is discarded without ever
    materializing an m-element aggregation buffer.

    Returns distinct candidate pairs (id_a < id_b).  Eager: the pair list is
    materialized (``localCheckpoint``), so downstream double-consumption
    (e.g. the verify stage joining both pair sides) does not recompute the
    pipeline, and no cache is left behind (ADVICE r1).  On a real cluster an
    executor loss after this call re-runs from the checkpoint's surviving
    blocks; swap in a reliable checkpoint dir if that matters.
    """
    if num_hashes:
        n = num_hashes
    else:
        first = sig_df.select(F.size("minhash")).head()
        if first is None:  # empty signature frame: no candidates
            return sig_df.sparkSession.createDataFrame(
                [], sig_df.select(F.col(id_col).alias("id_a"),
                                  F.col(id_col).alias("id_b")).schema)
        n = first[0]
    rows_per_band = max(n // bands, 1)
    banded = _band_buckets(sig_df, id_col, bands, rows_per_band, band_hash)
    group_keys = ["band", "band_hash"]
    if max_bucket_size is not None:
        from pyspark.sql import Window
        w = Window.partitionBy("band", "band_hash")
        if hot_buckets == "chain":
            cap = max_bucket_size
            # window first, generator second: Spark cannot resolve a window
            # function inside explode()'s child expression
            banded = banded.withColumn(
                "_rn", F.row_number().over(w.orderBy(id_col)))
            rn = F.col("_rn")
            sub = F.floor((rn - F.lit(1)) / F.lit(cap)).cast("int")
            boundary = (rn > cap) & (F.pmod(rn - 1, F.lit(cap)) == 0)
            subs = (F.when(boundary, F.array(sub - 1, sub))
                    .otherwise(F.array(sub)))
            banded = banded.select(
                F.col(id_col), "band", "band_hash",
                F.explode(subs).alias("_sub"))
            group_keys = ["band", "band_hash", "_sub"]
        elif hot_buckets == "drop":
            banded = (banded
                      .withColumn("_bn", F.count("*").over(w))
                      .filter(F.col("_bn") <= max_bucket_size)
                      .drop("_bn"))
        else:
            raise ValueError(f"unknown hot_buckets mode: {hot_buckets}")
    buckets = (
        banded.groupBy(*group_keys)
        .agg(F.array_sort(F.collect_list(id_col)).alias("_ids"))
        .filter(F.size("_ids") > 1)
    )
    ids = F.col("_ids")
    m = F.size(ids)
    # all ordered pairs from the sorted bucket list, generated in-row:
    # for i in [1, m-1]: for b in ids[i+1..m]: (ids[i], b)
    pair_arr = F.flatten(F.transform(
        F.sequence(F.lit(1), m - 1),
        lambda i: F.transform(
            F.slice(ids, i + 1, m),
            lambda b: F.struct(
                F.element_at(ids, i).alias("id_a"), b.alias("id_b")))))
    return (
        buckets.select(F.explode(pair_arr).alias("_p"))
        .select(F.col("_p.id_a"), F.col("_p.id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def jaccard_similarity(df_pairs: DataFrame, docs: DataFrame, id_col: str,
                       text_col: str, shingle_n: int = 3) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify stage).

    Joins the (small) pair list against the corpus twice; set ops are
    ``array_intersect``/``array_union`` over distinct shingle arrays.
    """
    # shingle only documents that appear in a candidate pair (semi-join
    # pushdown) — at scale the pair list is tiny relative to the corpus
    needed = (df_pairs.select(F.col("id_a").alias(id_col))
              .union(df_pairs.select(F.col("id_b").alias(id_col))).distinct())
    sh = (
        docs.join(F.broadcast(needed), id_col, "left_semi")
        .select(F.col(id_col), tokens(text_col).alias("_ws"))
        .select(F.col(id_col),
                F.array_distinct(shingles_of(F.col("_ws"), shingle_n)).alias("sh"))
    ).persist()  # consumed twice (both sides of the pair join)
    try:
        a = sh.alias("sa")
        b = sh.alias("sb")
        inter = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
        union = F.size(F.array_union(F.col("sa.sh"), F.col("sb.sh")))
        # eager (scores are |pairs|-sized, small) so the shingle cache can be
        # released before returning — no storage accumulation across calls
        scored = (
            df_pairs.join(a, df_pairs.id_a == F.col(f"sa.{id_col}"))
            .join(b, df_pairs.id_b == F.col(f"sb.{id_col}"))
            .select(
                "id_a", "id_b",
                F.when(union > 0, F.round(inter / union, 4)).otherwise(0.0).alias("jaccard"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        sh.unpersist()
    return scored


def minhash_near_dup_pairs(df: DataFrame, id_col: str, text_col: str,
                           num_hashes: int = 32, bands: int = 8,
                           shingle_n: int = 3,
                           threshold: float = 0.5,
                           verifiable: bool = False) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidate
    pairs → exact Jaccard verify → threshold filter.

    ``verifiable=True`` switches both hash families to pure/portable math
    (md5 token hash + polynomial band hash) and drops docs too short to
    shingle, making the ENTIRE pipeline — candidate generation included —
    bit-reproducible in any SQL engine with ``md5()``.  Identical plan
    shape and shuffle count; the only cost is md5 vs xxhash64 per token.
    The production (non-verifiable) path chain-chunks hot buckets instead
    of dropping them, so mass-boilerplate clusters keep their connectivity
    (see ``lsh_candidate_pairs``); verifiable mode keeps drop semantics —
    the behavior its SQL oracle mirrors."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n,
                              token_hash="md5" if verifiable else "xxhash64")
    if verifiable:
        sigs = sigs.filter(F.col("minhash")[0].isNotNull())
    pairs = lsh_candidate_pairs(sigs, id_col, bands, num_hashes=num_hashes,
                                band_hash="poly" if verifiable else "murmur3",
                                hot_buckets="drop" if verifiable else "chain")
    verified = jaccard_similarity(pairs, df, id_col, text_col, shingle_n)
    return verified.filter(F.col("jaccard") >= threshold)


def connected_components(edges: DataFrame, nodes: DataFrame,
                         id_col: str = "id",
                         src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 20) -> DataFrame:
    """Connected components of the near-dup pair graph: ``(id, component)``
    where ``component`` is the smallest node id reachable from ``id`` —
    the canonical representative, so "keep one doc per duplicate cluster"
    is ``filter(id == component)``.

    Iterative min-label propagation: each round joins the (bidirected) edge
    list against current labels and takes the per-node min — one keyed
    shuffle per round, converging in O(graph diameter) rounds.  Near-dup
    clusters are dense (LSH+verify emits most intra-cluster pairs), so the
    diameter is tiny (2-3 rounds in practice).  Lineage is truncated per
    round (``localCheckpoint``) — without it the plan doubles every round
    and the optimizer, not the data, becomes the bottleneck.  Genuinely
    iterative ⇒ not expressible as one SQL statement in Spark; the DuckDB
    oracle mirrors it with a recursive CTE.
    """
    bi = (edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
          .union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d"))))
    labels = nodes.select(F.col(id_col).alias("_id"),
                          F.col(id_col).alias("_comp")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        prop = (bi.join(labels, bi["_s"] == labels["_id"])
                .select(F.col("_d").alias("_id"), F.col("_comp")))
        new = (labels.union(prop).groupBy("_id")
               .agg(F.min("_comp").alias("_comp"))
               .localCheckpoint(eager=True))
        changed = (new.alias("n")
                   .join(labels.alias("o"), "_id")
                   .filter(F.col("n._comp") != F.col("o._comp")).count())
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("_id").alias(id_col),
                         F.col("_comp").alias("component"))


def simhash(df: DataFrame, id_col: str, text_col: str,
            token_hash: str = "murmur3") -> DataFrame:
    """32-bit SimHash: per-token hash, sign-vote per bit position,
    reassembled to one integer signature.

    explode → groupBy(doc) is one shuffle; the 32 per-bit votes are columnar
    conditional sums (partial-aggregated map-side), not a Python loop.
    ``token_hash="md5"`` uses the first 32 bits of md5 instead of Murmur3 —
    same plan, but reproducible cross-engine (see ``token_hash_expr``).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = (F.hash("tok") if token_hash == "murmur3"
         else token_hash_expr(F.col("tok"), "md5", bits=32))
    votes = [
        F.sum(F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)).alias(f"v{b}")
        for b in range(32)
    ]
    voted = tok.groupBy(id_col).agg(*votes)
    sig = sum(
        (F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0)) for b in range(32)),
        F.lit(0),
    )
    return voted.select(F.col(id_col), sig.cast("long").alias("simhash"))


def chargram_minhash_pairs(df: DataFrame, id_col: str, text_col: str,
                           num_hashes: int = 32, bands: int = 8,
                           n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Character-n-gram MinHash-LSH near-dup pairs — the unit of choice for
    short or unsegmented (CJK-like) text where word shingles are too coarse.

    Always runs in the verifiable md5 hash family.  Simpler plan than the
    word pipeline: each char n-gram IS the shingle, so after the explode +
    codegen md5 projection the 32 affine mins aggregate DIRECTLY over rows
    (map-side partial — no array reassembly at all), then banding/verify
    reuse ``lsh_candidate_pairs`` / char-gram Jaccard."""
    from ..catalog import spread
    from ..functions.textfns import char_ngrams
    # char-level explode + md5 is CPU-bound before any shuffle — spread a
    # single-split source first (same guard as minhash_signatures)
    df = spread(df)
    p = MINHASH_P
    grams = (
        df.select(F.col(id_col), F.explode(char_ngrams(text_col, n)).alias("_g"))
        .select(F.col(id_col),
                F.pmod(token_hash_expr(F.col("_g"), "md5"), F.lit(p)).alias("_h"))
        .distinct())
    aggs = [F.min(F.pmod(F.col("_h") * F.lit(2 * i + 1)
                         + F.lit(i * 98765431), F.lit(p))).alias(f"_m{i}")
            for i in range(num_hashes)]
    sigs = (grams.groupBy(id_col).agg(*aggs)
            .select(F.col(id_col),
                    F.array(*[f"_m{i}" for i in range(num_hashes)])
                     .alias("minhash")))
    pairs = lsh_candidate_pairs(sigs, id_col, bands, num_hashes=num_hashes,
                                band_hash="poly")
    gsets = (df.select(F.col(id_col),
                       F.array_distinct(char_ngrams(text_col, n)).alias("gs"))
             .persist())
    try:
        a, b = gsets.alias("ga"), gsets.alias("gb")
        inter = F.size(F.array_intersect(F.col("ga.gs"), F.col("gb.gs")))
        union = F.size(F.array_union(F.col("ga.gs"), F.col("gb.gs")))
        out = (pairs.join(a, pairs.id_a == F.col(f"ga.{id_col}"))
               .join(b, pairs.id_b == F.col(f"gb.{id_col}"))
               .select("id_a", "id_b",
                       F.when(union > 0, F.round(inter / union, 4))
                        .otherwise(0.0).alias("jaccard"))
               .filter(F.col("jaccard") >= threshold)
               .localCheckpoint(eager=True))
    finally:
        gsets.unpersist()
    return out


def incremental_exact_dedup(new_docs: DataFrame, state_path: str,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            fmt=None) -> tuple[DataFrame, dict]:
    """Production incremental dedup: deduplicate a NEW batch against the
    fingerprints of everything already accepted, then commit the batch's
    novel fingerprints — so tomorrow's batch dedups against today's.

    Returns ``(unique_docs, stats)``: the batch rows that are neither
    in-batch duplicates (min ``id_col`` per fingerprint wins, same rule as
    ``exact_dedup``) nor historical duplicates, plus counts of each class.
    The fingerprint store is a ``TxnLogFormat`` table (atomic append), so
    a crash between computing and committing replays convergently: the
    rerun recomputes the same novel set, and the left-anti against the
    store makes re-appending the same batch a no-op — the same
    exactly-once-by-idempotence contract as the ingest state.

    Scale: the store carries (fp, first_id) only — 2 narrow columns per
    unique doc ever seen; the batch joins it fp-keyed (broadcast while
    small, shuffle beyond), never the full corpus text."""
    from ..sinks import TxnLogFormat
    fmt = fmt or TxnLogFormat()
    spark = new_docs.sparkSession
    fp = fingerprint(text_col).alias("fp")
    batch = new_docs.select(F.col(id_col), fp)
    in_batch_first = (batch.groupBy("fp")
                      .agg(F.min(id_col).alias("first_id")))
    n_rows = new_docs.count()
    n_batch_unique = in_batch_first.count()
    # log-presence probe, not except FileNotFoundError: a store whose log
    # exists but whose data dirs are gone is CORRUPTION — treating it as
    # empty would re-accept every historical duplicate
    if fmt._commits(state_path):
        seen = fmt.read(spark, state_path).select("fp")
        novel = in_batch_first.join(seen, "fp", "left_anti")
    else:
        novel = in_batch_first
    novel = novel.localCheckpoint(eager=True)  # pin before the store moves
    n_novel = novel.count()
    if n_novel:
        fmt.append(novel, state_path)
    unique_docs = new_docs.join(
        novel.select(F.col("first_id").alias(id_col)), id_col, "left_semi")
    stats = {"batch_rows": n_rows,
             "in_batch_dupes": n_rows - n_batch_unique,
             "historical_dupes": n_batch_unique - n_novel,
             "accepted": n_novel}
    return unique_docs, stats


def incremental_minhash_dedup(new_docs: DataFrame, state_path: str,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              num_hashes: int = 32, bands: int = 8,
                              shingle_n: int = 3,
                              threshold: float = 0.5,
                              max_bucket_size: int | None = 500,
                              verifiable: bool = False,
                              fmt=None) -> tuple[DataFrame, dict]:
    """Incremental NEAR-dup detection: find near-duplicate pairs between a
    NEW batch and everything already accepted (plus within the batch),
    using a persistent MinHash SIGNATURE store — the daily-ingest shape
    where yesterday's corpus text is no longer at hand, only its
    signatures.  The ``minhash_near_dup_pairs`` counterpart of
    ``incremental_exact_dedup``.

    Per batch: signatures for the new docs; the store (a ``TxnLogFormat``
    table of ``(id, minhash)`` — num_hashes longs per unique doc ever
    accepted) is banded and JOIN-PRUNED to buckets the batch actually
    touches (left-semi on the batch's (band, bucket) keys), so the cost
    scales with the batch and its collisions, never the corpus.  Pairs
    are generated in-row per bucket exactly like ``lsh_candidate_pairs``
    but with a new-member flag so historical-historical pairs are never
    emitted; the bucket-size cap counts the FULL population of any bucket
    containing a new member (matched store rows + batch rows), which is
    identical to the one-shot pipeline's count for those buckets — so
    batch-then-batch equals one-shot, asserted by test.  Verification is
    the ESTIMATED Jaccard (fraction of agreeing signature slots —
    exact-text Jaccard is impossible without the historical text):
    ``n_agree >= ceil(threshold * num_hashes)``, integer-exact in any
    engine.  Finally the batch's signatures are appended id-novel-only,
    so replaying a crashed batch converges (same contract as the exact
    store).

    Returns ``(pairs, stats)``: pairs ``(id_a, id_b, n_agree,
    est_jaccard)`` with at least one new member, and counts.
    ``verifiable=True`` uses the md5 + polynomial hash families so a SQL
    oracle replays signatures, buckets, and estimates bit-for-bit.
    Docs too short to shingle have no signature and never pair (the
    one-shot verifiable path drops them identically)."""
    import math

    from pyspark.sql import Window

    from ..sinks import TxnLogFormat
    fmt = fmt or TxnLogFormat()
    spark = new_docs.sparkSession
    sigs_new = minhash_signatures(
        new_docs, id_col, text_col, num_hashes, shingle_n,
        token_hash="md5" if verifiable else "xxhash64")
    # pin: consumed by banding, the verify join, and the store append
    sigs_new = (sigs_new.filter(F.col("minhash")[0].isNotNull())
                .localCheckpoint(eager=True))
    # distinguish "store not created yet" from "store exists but its data
    # is gone" (vacuumed/corrupted — read() raises FileNotFoundError for
    # both): treating corruption as empty would silently admit near-dups
    # AND append ids the broken log already records
    store_existed = bool(fmt._commits(state_path))
    if store_existed:
        store = fmt.read(spark, state_path).select(
            F.col(id_col), F.col("minhash"))
        store_ids = store.select(id_col)
        # a replayed/overlapping batch's ids may already be in the store;
        # the batch's own (identical, deterministic) signatures supersede
        # them — without this a rerun pairs every doc with its own store
        # copy (self-pairs) and double-counts cross candidates
        sigs_old = store.join(sigs_new.select(id_col), id_col,
                              "left_anti")
    else:
        sigs_old = spark.createDataFrame([], sigs_new.schema)
        store_ids = sigs_old.select(id_col)

    band_hash = "poly" if verifiable else "murmur3"
    rows_per_band = max(num_hashes // bands, 1)
    nb = _band_buckets(sigs_new, id_col, bands, rows_per_band, band_hash) \
        .withColumn("_new", F.lit(True))
    ob = _band_buckets(sigs_old, id_col, bands, rows_per_band, band_hash) \
        .withColumn("_new", F.lit(False))
    # join-prune the store to buckets the batch touches BEFORE any
    # window/aggregate: the store side never shuffles untouched buckets
    touched = nb.select("band", "band_hash").distinct()
    union_b = (ob.join(touched, ["band", "band_hash"], "left_semi")
               .unionByName(nb))
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "band_hash")
        union_b = (union_b.withColumn("_bn", F.count("*").over(w))
                   .filter(F.col("_bn") <= max_bucket_size).drop("_bn"))
    buckets = (union_b.groupBy("band", "band_hash")
               .agg(F.array_sort(F.collect_list(F.struct(
                   F.col(id_col).alias("id"),
                   F.col("_new").alias("nw")))).alias("_ms"))
               .filter(F.size("_ms") > 1))
    ms, m = F.col("_ms"), F.size("_ms")
    pair_arr = F.flatten(F.transform(
        F.sequence(F.lit(1), m - 1),
        lambda i: F.transform(
            F.slice(ms, i + 1, m),
            lambda b: F.struct(
                F.element_at(ms, i)["id"].alias("id_a"),
                b["id"].alias("id_b"),
                (F.element_at(ms, i)["nw"] | b["nw"]).alias("any_new")))))
    pairs = (buckets.select(F.explode(pair_arr).alias("_p"))
             .filter(F.col("_p.any_new"))
             .select("_p.id_a", "_p.id_b").distinct())

    all_sigs = sigs_old.unionByName(sigs_new)
    sa = all_sigs.select(F.col(id_col).alias("id_a"),
                         F.col("minhash").alias("_sa"))
    sb = all_sigs.select(F.col(id_col).alias("id_b"),
                         F.col("minhash").alias("_sb"))
    # signature slots are never null here (null-sig docs were filtered),
    # so plain equality mirrors the SQL oracle exactly
    n_agree = F.size(F.filter(
        F.zip_with("_sa", "_sb", lambda x, y: x == y),
        lambda v: v)).cast("long")
    min_agree = int(math.ceil(threshold * num_hashes))
    verified = (pairs.join(sa, "id_a").join(sb, "id_b")
                .select("id_a", "id_b", n_agree.alias("n_agree"))
                .filter(F.col("n_agree") >= min_agree)
                .withColumn("est_jaccard",
                            F.col("n_agree") / F.lit(num_hashes)))

    novel = (sigs_new.join(store_ids, id_col, "left_anti")
             if store_existed else sigs_new)
    novel = novel.localCheckpoint(eager=True)
    n_novel = novel.count()
    if n_novel:
        fmt.append(novel, state_path)
    stats = {"batch_sigs": sigs_new.count(),
             "accepted_sigs": n_novel}
    return verified, stats


def kmv_hash(col: Column) -> Column:
    """Portable 52-bit md5 hash in [1, 2^52) for KMV/bottom-k sketches —
    ``token_hash_expr`` md5 mode at bits=52 (13 hex chars keep
    ``(k-1) * 2^52`` far inside BIGINT for the estimator) with a floor of
    1 so the estimator's divisor can never be zero.  DuckDB twin:
    ``GREATEST(('0x' || substring(md5(x), 1, 13))::BIGINT, 1)``."""
    return F.greatest(token_hash_expr(col.cast("string"), "md5", bits=52),
                      F.lit(1))


def kmv_bottom_k(df: DataFrame, set_col: str, k: int) -> DataFrame:
    """Per-set k smallest DISTINCT hash values (columns: set_col, h) —
    the KMV sketch is a SET of hash values, so colliding inputs occupy
    one slot (the definition every consumer shares: the batch query, the
    streaming fold, and both DuckDB oracles rank over ``SELECT
    DISTINCT``).  One distinct shuffle + per-set rank; k rows survive
    per set regardless of input size."""
    w = Window.partitionBy(set_col).orderBy("h")
    return (df.select(set_col, "h").distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def segment_dedup(df: DataFrame, id_col: str, text_col: str,
                  chunk_chars: int = 80, min_docs: int = 2) -> DataFrame:
    """Cross-document SEGMENT dedup — the CCNet/C4 boilerplate-removal
    shape (dedup at paragraph granularity, not document granularity):
    documents are cut into deterministic non-overlapping segments, a
    segment whose exact hash occurs in >= ``min_docs`` DISTINCT documents
    is boilerplate (headers, footers, license blocks, injected templates),
    and the per-document result reports how much content survives.

    Returns one row per document: ``n_segments``, ``n_boiler`` (segments
    removed), ``chars_kept`` (characters in surviving segments),
    ``max_seg_docs`` (how widely this doc's most-shared segment spreads).

    Complements the doc-level MinHash/SimHash tier: two documents can be
    globally dissimilar yet share a boilerplate paragraph — doc-level
    near-dup never sees it, segment dedup removes exactly it.

    Scale shape: in-row explode (factor ~len/chunk_chars), ONE hash
    groupBy for segment frequencies, one keyed join back, one per-doc
    re-aggregate — linear end to end, never all-pairs, and the frequency
    table is itself a dedupable rollup at 100 TB (cell-wise mergeable
    across shards like the CMS/KMV sketches).  Segmentation is the same
    character-offset chunker as ``chunk_text`` (operators/text.py) with
    overlap=0, so boundaries are reproducible cross-engine."""
    from .text import chunk_text

    segs = (chunk_text(df, id_col, text_col,
                       chunk_chars=chunk_chars, overlap=0)
            .withColumn("h", F.md5("chunk")))
    freq = segs.groupBy("h").agg(
        F.countDistinct(id_col).alias("n_docs"))
    tagged = segs.join(freq, "h")
    is_boiler = F.col("n_docs") >= min_docs
    return (tagged.groupBy(id_col)
            .agg(F.count("*").alias("n_segments"),
                 F.sum(is_boiler.cast("long")).alias("n_boiler"),
                 F.sum(F.when(~is_boiler, F.col("chunk_len"))
                        .otherwise(0)).alias("chars_kept"),
                 F.max("n_docs").alias("max_seg_docs")))


def dedup_substrings(df: DataFrame, id_col: str, text_col: str,
                     min_len: int = 40) -> DataFrame:
    """EXACT SUBSTRING deduplication (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022 — the
    suffix-array ExactSubstr method, re-expressed as three keyed
    shuffles instead of a monolithic suffix array): every verbatim
    character span of at least ``min_len`` that occurs more than once
    ANYWHERE in the corpus is cut from every occurrence except the
    globally first, and the surviving text is reconstructed.

    Distributed shape (the suffix array is a single-machine construct;
    this is the 100 TB re-expression):

    1. Per-position Rabin-Karp hashes of every ``min_len``-gram — two
       independent bases over ONE staged char-code array, pure codegen
       (``functions.textfns.rolling_hashes_of``), so grouping on the
       (h1, h2) pair needs no byte verification (collision odds
       ~n²/2⁶²).  A span repeated for ANY length ≥ min_len duplicates
       all its covering min_len-grams, so cutting the union of
       duplicated grams removes exactly the maximal repeated spans.
    2. One partial-aggregation-safe groupBy on the hash pair computes
       each gram's globally-first occurrence (``min(struct(doc, pos))``
       — a true aggregate, so map-side combine collapses a hot gram to
       ONE row per input partition before the shuffle) plus its count;
       grams seen ≥2× join back against the occurrences and every
       occurrence EXCEPT the keeper becomes a removal interval
       ``[pos, pos+min_len)``.  At least one copy of every span
       survives — the Lee et al. keep-first rule.  This deliberately is
       NOT a ``row_number`` window over ``partitionBy(h1, h2)``: a hot
       boilerplate gram (license header, template row — the common case
       in web corpora) occurs 10⁷–10⁸ times at 100 TB, and window
       operators get neither partial aggregation nor AQE skew-join
       splitting, so the window form concentrates every occurrence in
       one task's buffer.  The groupBy form bounds per-task state at
       (distinct grams per partition) regardless of skew, and the
       join-back is an equi-join AQE can skew-split.
    3. One shuffle on the doc: overlapping/adjacent intervals merge via
       the classic gaps-and-islands window (running max of prior ends),
       and the cleaned text is rebuilt by concatenating the kept
       segments between merged intervals — per-INTERVAL work, not
       per-char (intervals per doc ≪ chars per doc).

    Returns one row per input doc: ``clean_text`` (normalized text with
    duplicated spans cut), ``n_dup_spans`` (merged intervals removed),
    ``chars_removed`` (length actually lost — derived from the
    RECONSTRUCTED string, so a rebuild bug cannot hide), plus the
    normalized original length ``n_chars``.  Docs shorter than
    ``min_len`` pass through untouched.  Fully deterministic — every
    stage is hash/rank math — and hash-reproducible in DuckDB (the
    oracle rebuilds the pipeline with the same bases)."""
    from ..functions.textfns import RK_BASE, RK_BASE2, rolling_hashes_of

    L = int(min_len)
    if L < 2:
        raise ValueError("min_len must be at least 2")
    staged = (
        df.select(F.col(id_col), normalize_text(text_col).alias("_t"))
        .withColumn("_cc", F.transform(F.split("_t", ""),
                                       lambda ch: F.ascii(ch)
                                       .cast("long")))
        .withColumn("_h1", rolling_hashes_of("_cc", L, base=RK_BASE))
        .withColumn("_h2", rolling_hashes_of("_cc", L, base=RK_BASE2))
        .drop("_cc"))
    occ = (
        staged.select(id_col, F.posexplode(F.arrays_zip("_h1", "_h2")))
        .select(id_col, (F.col("pos") + 1).alias("s"),
                F.col("col._h1").alias("h1"), F.col("col._h2").alias("h2")))
    # Keeper per gram = min by (doc, pos) — struct ordering is
    # field-by-field, identical to the orderBy(id, s) rank-1 row of the
    # window formulation this replaces (see step 2 of the docstring for
    # why a window on a skewable gram key is forbidden here).
    keep = (
        occ.groupBy("h1", "h2")
        .agg(F.min(F.struct(F.col(id_col).alias("_kid"),
                            F.col("s").alias("_ks"))).alias("_keep"),
             F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .select("h1", "h2", F.col("_keep._kid").alias("_kid"),
                F.col("_keep._ks").alias("_ks")))
    cut = (
        occ.join(keep, ["h1", "h2"])
        .filter((F.col(id_col) != F.col("_kid"))
                | (F.col("s") != F.col("_ks")))
        .select(id_col, "s", (F.col("s") + L).alias("e")))
    by_doc = Window.partitionBy(id_col).orderBy("s")
    prior_end = F.max("e").over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1))
    merged = (
        cut.withColumn("_new", F.when(
                F.col("s") <= F.coalesce(prior_end, F.lit(-1)),
                F.lit(0)).otherwise(F.lit(1)))
        .withColumn("_gid", F.sum("_new").over(by_doc))
        .groupBy(id_col, "_gid")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("s", "e")))
              .alias("_iv")))
    out = staged.drop("_h1", "_h2").join(merged, id_col, "left")
    # rebuild: fold the merged intervals, concatenating each kept
    # segment between them, then the tail — O(intervals) per doc
    rebuilt = F.aggregate(
        "_iv",
        F.struct(F.lit(1).cast("long").alias("p"),
                 F.lit("").alias("acc")),
        lambda a, iv: F.struct(
            iv["e"].cast("long").alias("p"),
            F.concat(a["acc"],
                     F.col("_t").substr(a["p"],
                                        iv["s"].cast("long") - a["p"]))
            .alias("acc")),
        lambda a: F.concat(
            a["acc"], F.col("_t").substr(
                a["p"], F.length("_t") - a["p"] + 1)))
    return (
        out.withColumn("clean_text",
                       F.when(F.col("_iv").isNull(), F.col("_t"))
                        .otherwise(rebuilt))
        .select(F.col(id_col),
                "clean_text",
                # size(NULL) is -1 under the legacy default, not NULL —
                # guard on the array itself, never coalesce the size
                F.when(F.col("_iv").isNull(), F.lit(0))
                 .otherwise(F.size("_iv")).alias("n_dup_spans"),
                (F.length("_t") - F.length("clean_text"))
                .alias("chars_removed"),
                F.length("_t").alias("n_chars")))
