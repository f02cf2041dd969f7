"""Web-scale deduplication operators over the documents/pages tables.

All hash functions are md5-based so the DuckDB oracle can reproduce them
bit-for-bit (engine-portable, seedable, no engine-specific hash()):

    h_seed(s) = int(hex(md5(seed || '|' || s))[:15], 16)      (60-bit)

Operators:
- exact_dedup          hash-groupBy on full text
- shingle n-gram Jaccard   set-similarity self-join on word n-grams
- MinHash + LSH        16 min-hashes, 4 bands x 4 rows, band-bucket join,
                       exact-Jaccard verify of candidates
- SimHash              48-bit sign-of-weighted-sum over unigram hashes,
                       near-dup candidates via 4x12-bit chunk match +
                       hamming <= 3 verify (bit_count(xor))

Everything is DataFrame ops on JVM built-ins (md5/conv/explode/groupBy) —
shuffles on (shingle), (band), (chunk) keys; no Python in any hot path.
At 10^12 docs the LSH band join is the standard near-dup plan: candidates
are generated per-bucket instead of any O(n^2) comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 16
BANDS = 4
ROWS_PER_BAND = 4
SIMHASH_BITS = 48

# MinHash family: ONE md5 per shingle, then 16 affine rehashes
# h_i = (a_i * h0 + b_i) mod (2^61 - 1) — the standard a*x+b family; at
# 10^12 docs this is 16x less hashing than md5-per-seed. Constants derived
# from md5 so the DuckDB oracle can re-generate them; a_i odd, < 2^29;
# b_i < 2^60; products < 2^90 fit decimal(38,0) / HUGEINT exactly.
MINHASH_P = (1 << 61) - 1


def _minhash_consts() -> tuple[list[int], list[int]]:
    import hashlib
    a = [int(hashlib.md5(f"a|{i}".encode()).hexdigest()[:7], 16) * 2 + 1
         for i in range(N_HASHES)]
    b = [int(hashlib.md5(f"b|{i}".encode()).hexdigest()[:15], 16)
         for i in range(N_HASHES)]
    return a, b


MINHASH_A, MINHASH_B = _minhash_consts()


def _h60(col, seed_col) -> F.Column:
    """60-bit md5-based hash, identical to the oracle's
    CAST('0x' || substr(md5(seed || '|' || s), 1, 15) AS BIGINT)."""
    return F.conv(F.substring(
        F.md5(F.concat(seed_col.cast("string"), F.lit("|"), col)), 1, 15),
        16, 10).cast("long")


def sql_h60(expr: str, seed_expr: str) -> str:
    return (f"CAST(('0x' || substr(md5(CAST({seed_expr} AS VARCHAR) || '|' || "
            f"{expr}), 1, 15)) AS BIGINT)")


def exact_dedup(docs: DataFrame, text_col: str = "text",
                key_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (text_hash, n_docs, min_doc_id), n_docs > 1."""
    return (docs
            .groupBy(F.md5(text_col).alias("text_hash"))
            .agg(F.count("*").alias("n_docs"), F.min(key_col).alias("min_doc_id"))
            .filter(F.col("n_docs") > 1))


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                  key_col: str = "doc_id") -> DataFrame:
    """Distinct word n-grams per doc: (doc_id, shingle).

    Dedup is doc-LOCAL (array_distinct before the explode), so the whole
    shingle table is produced map-side with ZERO shuffle — the former
    global DISTINCT exchanged one row per (doc, shingle), which at corpus
    scale is the largest relation in the dedup pipeline.

    INPUT CONTRACT: exactly ONE input row per ``key_col`` value. A doc_id
    spanning multiple rows would emit duplicate (doc_id, shingle) pairs,
    inflating ngram_jaccard_pairs' count(*)-based sizes/intersections and
    the LSH band buckets (ADVICE r4). Pre-aggregate the text per key
    (e.g. groupBy(key).agg(concat_ws(' ', collect_list(text)))) before
    calling if the source is sharded."""
    toks = docs.select(key_col, F.split(F.col(text_col), " ").alias("toks"))
    return toks.select(
        key_col,
        F.explode(F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.array_join(F.slice("toks", i + 1, n), " ")))).alias("shingle"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """All pairs (a < b) with Jaccard(shingle sets) >= threshold.

    Plan: shingle self-join on the shingle key (shuffle partitioned by
    shingle — hot shingles are the skew point; AQE splits them), then
    |A∩B| / (|A| + |B| - |A∩B|). Output integers only (doc ids + the
    intersection/union sizes) so the oracle compare is float-free."""
    sh = word_shingles(docs, n, text_col, key_col).cache()
    sizes = sh.groupBy(key_col).agg(F.count("*").alias("sz"))
    a = sh.toDF("da", "shingle")
    b = sh.toDF("db", "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("da") < F.col("db"))
             .groupBy("da", "db").agg(F.count("*").alias("n_common")))
    out = (inter
           .join(sizes.toDF("da", "sza"), "da")
           .join(sizes.toDF("db", "szb"), "db")
           .withColumn("n_union", F.col("sza") + F.col("szb") - F.col("n_common"))
           .filter(F.col("n_common") >= F.lit(threshold) * F.col("n_union"))
           .select("da", "db", "n_common", "n_union"))
    return out


def minhash_signature_table(docs: DataFrame, n: int = 3,
                            text_col: str = "text",
                            key_col: str = "doc_id",
                            shingles: DataFrame | None = None) -> DataFrame:
    """Wide signature table (doc_id, mh0..mh15): the i-th min-hash as a
    column, computed with ONE shuffle — 16 min() aggregates over the affine
    family h_i = (a_i*h0 + b_i) mod p (decimal(38,0) keeps the product
    exact; the oracle uses HUGEINT). No row explosion: the narrow
    (doc, seed, minhash) layout would shuffle 16x the rows.

    ``shingles``: pre-computed (cached) word_shingles output — lets callers
    share one shingle scan between the signature chain and an exact-verify
    pass instead of shingling the corpus twice.

    The modular product (a_i * h0 + b_i) mod (2^61 - 1) runs in pure BIGINT
    shift-fold arithmetic (p is Mersenne: 2^61 ≡ 1 mod p, so the h0-high
    partial product folds with two shifts) — no decimal(38,0) in the
    generated code; mathematically identical to the wide-integer form the
    DuckDB oracle still computes with HUGEINT. Overflow audit: h0 < 2^60,
    a < 2^29, b < 2^60 -> every intermediate < 2^63."""
    sh = shingles if shingles is not None else word_shingles(
        docs, n, text_col, key_col)
    # materialize the md5 hash ONCE per shingle row in a projection below
    # the aggregate: the 16 min() expressions are separate aggregate
    # functions, so codegen does not common-subexpression the md5 across
    # them — inlined, every row paid 16 md5+conv evaluations (profiled:
    # the signature stage dominated the whole LSH query)
    sh = sh.select(key_col, _h60(F.col("shingle"), F.lit(0)).alias("h0"))
    h0 = F.col("h0")
    hi = F.shiftrightunsigned(h0, 30)            # < 2^30
    lo = h0.bitwiseAND(F.lit((1 << 30) - 1))     # < 2^30

    def affine_mod(a: int, b: int) -> F.Column:
        t1 = F.lit(a) * hi                       # a*hi < 2^59
        # (t1 * 2^30) mod p == (t1 >> 31) + ((t1 & (2^31-1)) << 30)  (< 2^61+2^28)
        t2 = (F.shiftrightunsigned(t1, 31)
              + F.shiftleft(t1.bitwiseAND(F.lit((1 << 31) - 1)), 30))
        t4 = t2 + F.lit(a) * lo + F.lit(b)       # < 2^63
        folded = F.shiftrightunsigned(t4, 61) + t4.bitwiseAND(F.lit(MINHASH_P))
        return folded % F.lit(MINHASH_P)

    aggs = [F.min(affine_mod(MINHASH_A[i], MINHASH_B[i])).alias(f"mh{i}")
            for i in range(N_HASHES)]
    return sh.groupBy(key_col).agg(*aggs)


def minhash_signatures(docs: DataFrame, n: int = 3, text_col: str = "text",
                       key_col: str = "doc_id") -> DataFrame:
    """(doc_id, seed, minhash) narrow view of minhash_signature_table."""
    w = minhash_signature_table(docs, n, text_col, key_col)
    stack = "stack(%d, %s) as (seed, minhash)" % (
        N_HASHES, ", ".join(f"{i}, mh{i}" for i in range(N_HASHES)))
    return w.select(key_col, F.expr(stack))


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                      text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """MinHash-LSH near-dup join: band-bucket candidates, exact-Jaccard
    verified. Returns (da, db, n_common, n_union) like ngram_jaccard_pairs
    — but candidates come from the LSH buckets, not an all-pairs join.

    One shingle scan feeds BOTH the signature chain and the exact verify
    (cached (doc_id, shingle) table) — shingling is the dominant map-side
    cost at corpus scale and must not run twice."""
    sh = word_shingles(docs, n, text_col, key_col).cache()
    w = minhash_signature_table(docs, n, text_col, key_col, shingles=sh)
    # band signature: minhashes concatenated in seed order, derived from the
    # wide table without a second shuffle
    band_cols = [
        F.concat_ws(",", *[F.col(f"mh{b * ROWS_PER_BAND + r}")
                           for r in range(ROWS_PER_BAND)]).alias(f"b{b}")
        for b in range(BANDS)]
    stack = "stack(%d, %s) as (band, band_sig)" % (
        BANDS, ", ".join(f"{b}, b{b}" for b in range(BANDS)))
    sig_s = (w.select(key_col, *band_cols)
             .select(key_col, F.expr(stack))
             .cache())  # both sides of the self-join read it; uncached the
    # whole shingle->minhash chain would run twice
    la = sig_s.toDF("da", "band", "band_sig")
    lb = sig_s.toDF("db", "band", "band_sig")
    cand = (la.join(lb, ["band", "band_sig"])
            .filter(F.col("da") < F.col("db"))
            .select("da", "db").distinct())
    # exact verify of the candidate set — reuses the cached shingle table
    sizes = sh.groupBy(key_col).agg(F.count("*").alias("sz"))
    a = sh.toDF("da", "shingle")
    b = sh.toDF("db", "shingle")
    inter = (cand.join(a, "da").join(b, ["db", "shingle"])
             .groupBy("da", "db").agg(F.count("*").alias("n_common")))
    return (inter
            .join(sizes.toDF("da", "sza"), "da")
            .join(sizes.toDF("db", "szb"), "db")
            .withColumn("n_union", F.col("sza") + F.col("szb") - F.col("n_common"))
            .filter(F.col("n_common") >= F.lit(threshold) * F.col("n_union"))
            .select("da", "db", "n_common", "n_union"))


def simhash(docs: DataFrame, text_col: str = "text",
            key_col: str = "doc_id", bits: int = SIMHASH_BITS,
            seed: int = 0, out_col: str = "simhash") -> DataFrame:
    """``bits``-bit SimHash over word unigrams (bits <= 60, the width of the
    md5-derived h60): bit b set iff the sum of (+1 if bit b of h(token) else
    -1) over distinct tokens is positive. ``seed`` selects an independent
    hash family (multi-table signatures wider than 60 bits).

    One aggregation with ``bits`` vote columns — the naive (key, bit) layout
    explodes rows bits-x and needs two more shuffles for identical math.

    ONE shuffle total: per-doc token dedup is doc-local, so it runs
    map-side as array_distinct(split(...)) instead of a global
    DISTINCT(key, tok) exchange, and the exploded votes hit the groupBy's
    partial aggregation — shuffle traffic is one combined row per doc per
    map partition, not one row per (doc, token)."""
    if not 1 <= bits <= 60:
        raise ValueError("simhash bits must be in [1, 60]")
    toks = (docs.select(key_col, F.explode(F.array_distinct(
                F.split(F.col(text_col), " "))).alias("tok"))
            .filter(F.col("tok") != "")
            .withColumn("h", _h60(F.col("tok"), F.lit(seed))))
    aggs = [F.sum(F.expr(
        f"CASE WHEN (shiftrightunsigned(h, {b}) & 1) = 1 "
        "THEN 1 ELSE -1 END")).alias(f"v{b}")
        for b in range(bits)]
    w = toks.groupBy(key_col).agg(*aggs)
    bitvals = [F.when(F.col(f"v{b}") > 0,
                      F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
               for b in range(bits)]
    total = bitvals[0]
    for bv in bitvals[1:]:
        total = total + bv
    return w.select(key_col, total.alias(out_col))


def simhash_chunk_bits(n_docs: int, max_hamming: int = 3,
                       target_bucket: int = 1024) -> int:
    """Pick the SimHash width for a corpus so candidate buckets stay small:
    chunk width w = ceil(bits / (max_hamming+1)) buckets 2^w docs into
    ~n_docs / 2^w per bucket; the within-bucket join is quadratic, so w must
    grow with the corpus. Returns the total signature ``bits`` (capped at 60,
    the h60 width) such that the expected bucket holds <= target_bucket docs.

    Web scale example: n_docs = 10^12, max_hamming = 3 -> w = 30 needed,
    bits = 120 > 60 cap, so two independent 60-bit tables (see
    ``simhash_pairs``'s n_tables) supply the remaining chunks."""
    import math
    w = max(1, math.ceil(math.log2(max(2, n_docs) / target_bucket)))
    return min(60, w * (max_hamming + 1))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", key_col: str = "doc_id",
                  bits: int = SIMHASH_BITS) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming. Candidates via
    exact match on one of (max_hamming+1) chunks of ceil(bits/(h+1)) bits
    (pigeonhole: hamming <= h implies at least one chunk equal), verified
    with bit_count(xor). Defaults (48 bits, h=3) give 4 x 12-bit chunks.

    Scale note: bucket count per chunk is 2^width; size ``bits`` with
    ``simhash_chunk_bits`` so the expected bucket stays bounded as the
    corpus grows — at 12-bit chunks and 10^12 docs each bucket would hold
    ~10^8 docs and the within-bucket join would be quadratic."""
    n_chunks = max_hamming + 1
    width = -(-bits // n_chunks)  # ceil: last chunk may be narrower, still
    # a valid pigeonhole cover of the bit range
    mask = (1 << width) - 1
    sh = simhash(docs, text_col, key_col, bits=bits).cache()
    return _chunk_join_pairs(sh, n_chunks, width, mask, max_hamming)


def _chunk_join_pairs(sh: DataFrame, n_chunks: int, width: int, mask: int,
                      max_hamming: int) -> DataFrame:
    chunks = (sh.withColumn("chunk", F.explode(
        F.sequence(F.lit(0), F.lit(n_chunks - 1))))
        .withColumn("ck", F.expr(
            f"shiftrightunsigned(simhash, chunk * {width}) & {mask}")))
    ca = chunks.toDF("da", "ha", "chunk", "ck")
    cb = chunks.toDF("db", "hb", "chunk", "ck")
    cand = (ca.join(cb, ["chunk", "ck"])
            .filter(F.col("da") < F.col("db"))
            .select("da", "db", "ha", "hb").distinct())
    return (cand
            .withColumn("hamming", F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("da", "db", "hamming"))


def simhash_pairs_multitable(docs: DataFrame, max_hamming: int = 4,
                             bits: int = 60, n_tables: int = 2,
                             text_col: str = "text",
                             key_col: str = "doc_id") -> DataFrame:
    """SimHash near-dup pairs over an EFFECTIVE ``n_tables * bits``-bit
    signature (independent seed per table) — the web-scale configuration
    simhash_chunk_bits points at when one 60-bit hash can't give wide
    enough chunks. EXACT by double pigeonhole: total hamming <= h over
    n_tables tables implies some table has hamming <= floor(h/n_tables),
    and that table's (floor(h/n_tables)+1)-chunk cover surfaces the pair.
    Candidates = union of per-table chunk joins; verify = sum of per-table
    bit_count(xor) <= h. Returns (da, db, hamming) with hamming over the
    concatenated signature."""
    per_h = max_hamming // n_tables
    n_chunks = per_h + 1
    width = -(-bits // n_chunks)
    mask = (1 << width) - 1
    wide = None
    for t in range(n_tables):
        s = simhash(docs, text_col, key_col, bits=bits, seed=t,
                    out_col=f"s{t}")
        wide = s if wide is None else wide.join(s, key_col)
    wide = wide.cache()
    cand = None
    for t in range(n_tables):
        chunks = (wide.select(key_col, f"s{t}")
                  .withColumn("chunk", F.explode(
                      F.sequence(F.lit(0), F.lit(n_chunks - 1))))
                  .withColumn("ck", F.expr(
                      f"shiftrightunsigned(s{t}, chunk * {width}) & {mask}")))
        ca = chunks.select(F.col(key_col).alias("da"), "chunk", "ck")
        cb = chunks.select(F.col(key_col).alias("db"), "chunk", "ck")
        c = (ca.join(cb, ["chunk", "ck"])
             .filter(F.col("da") < F.col("db")).select("da", "db"))
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()
    wa = wide.toDF("da", *[f"a{t}" for t in range(n_tables)])
    wb = wide.toDF("db", *[f"b{t}" for t in range(n_tables)])
    joined = cand.join(wa, "da").join(wb, "db")
    ham = None
    for t in range(n_tables):
        h = F.bit_count(F.col(f"a{t}").bitwiseXOR(F.col(f"b{t}")))
        ham = h if ham is None else ham + h
    return (joined.withColumn("hamming", ham)
            .filter(F.col("hamming") <= max_hamming)
            .select("da", "db", "hamming"))
