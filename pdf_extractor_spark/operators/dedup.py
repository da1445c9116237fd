"""Deduplication operators for the training-data pipeline.

Ladder (cheapest first; each output feeds the next as a filter):
  1. exact      — sha2(text) groupBy           (catalog: a5_dedup_exact)
  2. simhash    — 32-bit sign-of-sums sketch    (here: simhash_docs)
  3. minhash+LSH — banded signature bucket join (here: minhash_lsh_pairs)
  4. n-gram Jaccard — exact verifier on candidates (inside minhash_lsh_pairs)

Everything is native Column expressions (whole-stage codegen, no Python), and
every hash is the cross-engine md5-prefix ``h32`` so the DuckDB oracle can
reproduce results bit-for-bit.

Scale notes (100 TB):
  - minhash signatures are one narrow pass over the scan (ONE md5 per
    token + 16 arithmetic permutation traversals); no shuffle until the
    band-bucket join.
  - the band join shuffles only (band_id, 16-byte key, doc_id) — tiny rows.
  - pathological buckets (boilerplate-identical docs) blow up m^2/2; at scale
    cap bucket size (count per key, drop or sample keys with > B members —
    those docs are exact-dup-able by signature anyway). Flagged via log, not
    silently (the cap is OFF here: the gate needs exact parity).
  - the Jaccard verify join re-reads only candidate docs' token arrays
    (semi-join pushdown on doc_id), not the corpus.

Reference parity: generalizes A5/S10 content-keyed dedup
(normalize_api.py:104-105, transaction_classifier.py:62-118) to near-dup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import h32

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
SIMHASH_BITS = 32

# Universal-hash permutation family for MinHash: perm_i(h) = (A_i*h + B_i)
# mod P over the 32-bit base hash h = h32(token). ONE md5 per token instead
# of N_HASHES of them (the r3 scheme hashed 'p{i}:'||tok per permutation —
# 16 md5 scans per token; the permutations are now integer multiply-adds in
# whole-stage codegen). P is the largest prime < 2^32; A_i < 2^31 keeps
# A_i*h < 2^63, so the arithmetic is exact (and ANSI-overflow-safe) in both
# Spark bigint and DuckDB BIGINT — the oracle reproduces it bit-for-bit.
# Constants are pinned by the seeded generator (deterministic across runs).
MINHASH_PRIME = 4294967291
_MINHASH_RNG = __import__("random").Random(20240517)
MINHASH_A = [_MINHASH_RNG.randrange(1, 1 << 31) for _ in range(N_HASHES)]
MINHASH_B = [_MINHASH_RNG.randrange(0, MINHASH_PRIME) for _ in range(N_HASHES)]


def tokenized(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, toks) with distinct whitespace tokens; empty docs dropped.
    Tokenization delegates to the shared cross-engine primitive so the
    dedup ladder cannot drift from the other ws_tokens consumers."""
    from ..functions.text import ws_tokens

    return docs.select(
        id_col, ws_tokens(F.col(text_col), distinct=True).alias("toks")
    ).where(F.size("toks") > 0)


def token_hash_col(toks=None) -> F.Column:
    """array<bigint> of per-token base hashes h32(tok) — computed ONCE per
    token; the N_HASHES permutations are arithmetic over this array."""
    if toks is None:
        toks = F.col("toks")
    return F.transform(toks, lambda t: h32(t))


def minhash_signature_cols(hs=None) -> list:
    """16 minhash columns over the pre-hashed token array ``hs``
    (token_hash_col): mh_i = min over tokens of (A_i*h32(tok)+B_i) mod P."""
    if hs is None:
        hs = F.col("hs")

    def _mh(i: int):
        a, b = MINHASH_A[i], MINHASH_B[i]
        # single-arg lambda (a 2-arg lambda would receive (element, index))
        return F.array_min(
            F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME)
        ).alias(f"mh{i}")

    return [_mh(i) for i in range(N_HASHES)]


def band_keys(prefix: str = "mh") -> list:
    """4 band keys: md5 of the comma-joined 4-row slice of the signature."""
    return [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"{prefix}{b * ROWS_PER_BAND + r}").cast("string")
                    for r in range(ROWS_PER_BAND)
                ],
            )
        ).alias(f"band{b}")
        for b in range(N_BANDS)
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified with exact
    token-set Jaccard. Returns (d1, d2, jaccard) with jaccard >= threshold,
    d1 < d2, 4-dp fixed point.

    With 16 perms / 4 bands x 4 rows, candidate recall at s=0.9 is
    1-(1-s^4)^4 ≈ 0.986; the DuckDB oracle mirrors the SAME pipeline, so the
    gate compares identical (not merely statistically similar) outputs.

    ``max_bucket``: the 100TB guard. A band bucket of m members yields
    m(m-1)/2 candidate pairs — boilerplate-identical documents create
    million-member buckets that quadratically dominate the join. Buckets
    larger than max_bucket are DROPPED (their members are exact/near-exact
    duplicates by signature; route them through the cheaper exact-hash
    dedup instead) and the drop is observable via the returned plan's
    `lsh_bucket_metrics` observation (n_buckets_dropped,
    n_memberships_dropped — band memberships, not distinct docs).
    None (the gate default) disables the cap so the oracle mirror stays exact.
    """
    toks = tokenized(docs, id_col, text_col)
    # three-step projection: hash each token once (the only md5 pass), then
    # derive the 16 permutations arithmetically, then band. CollapseProject
    # keeps the expensive `hs` transform un-inlined (16 references to a
    # non-cheap expression), so the md5 pass stays single in the final plan.
    sig = (
        toks.select(id_col, "toks", token_hash_col().alias("hs"))
        .select(id_col, "toks", *minhash_signature_cols())
        .select(id_col, "toks", *band_keys())
    )
    bands = sig.select(
        F.col(id_col).alias("bid"),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])).alias(
            "band_id", "key"
        ),
    )
    if max_bucket is not None:
        from pyspark.sql import Observation, Window

        w = Window.partitionBy("band_id", "key")
        sized = bands.withColumn("bucket_n", F.count("*").over(w)).withColumn(
            "is_first",
            F.row_number().over(w.orderBy("bid")) == 1,
        )
        obs = Observation("lsh_bucket_metrics")
        # observe() forbids distinct aggregates: count buckets via the
        # first-row flag instead of count_distinct. NOTE the second metric
        # counts BAND MEMBERSHIPS, not distinct documents — a doc landing in
        # k oversized buckets contributes k (distinct-doc counting would need
        # a disallowed distinct agg); it upper-bounds affected docs by
        # N_BANDS x the true count.
        sized = sized.observe(
            obs,
            F.sum(
                ((F.col("bucket_n") > max_bucket) & F.col("is_first")).cast("long")
            ).alias("n_buckets_dropped"),
            F.sum((F.col("bucket_n") > max_bucket).cast("long")).alias(
                "n_memberships_dropped"
            ),
        )
        bands = sized.where(F.col("bucket_n") <= max_bucket).drop(
            "bucket_n", "is_first"
        )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.bid") < F.col("b.bid")),
        )
        .select(F.col("a.bid").alias("d1"), F.col("b.bid").alias("d2"))
        .distinct()
    )
    t1 = toks.select(F.col(id_col).alias("d1"), F.col("toks").alias("toks1"))
    t2 = toks.select(F.col(id_col).alias("d2"), F.col("toks").alias("toks2"))
    inter = F.size(F.array_intersect("toks1", "toks2")).cast("double")
    union = F.size("toks1") + F.size("toks2") - F.size(F.array_intersect("toks1", "toks2"))
    jac = F.floor(inter / union * 10000 + F.lit(0.5)) / 10000.0
    return (
        cand.join(t1, "d1")
        .join(t2, "d2")
        .select("d1", "d2", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: candidates share at least one of the 4 8-bit
    bands of their 32-bit simhash (pigeonhole: hamming<=3 over 4 bands
    GUARANTEES a shared band — exact recall, not probabilistic), verified by
    bit_count(xor) <= max_hamming. Returns (d1, d2, hamming).

    Scale: the band join shuffles (band_id, band_value:int, id) — even
    smaller rows than MinHash LSH; simhash computation is one explode+agg."""
    sh = simhash_docs(docs, id_col, text_col)
    bands = sh.select(
        F.col(id_col).alias("bid"),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 8 * b).bitwiseAND(F.lit(255))
                    for b in range(4)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.bid") < F.col("b.bid")),
        )
        .select(
            F.col("a.bid").alias("d1"),
            F.col("b.bid").alias("d2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
    )
    return cand.where(F.col("hamming") <= max_hamming)


def simhash_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash per document: for each bit b, sum +1/-1 over token
    occurrences (frequency-weighted) by whether bit b of h32(token) is set;
    simhash = Σ 2^b over positive sums. Returns (id, simhash:bigint).

    Scale: explode + two-phase groupBy — the partial agg combines the 32 sums
    map-side, so the shuffle carries one row per doc."""
    tok = docs.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    h = h32(F.col("tok"))
    sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    bits = [
        F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    ]
    simhash = bits[0]
    for expr in bits[1:]:
        simhash = simhash + expr
    return sums.select(id_col, simhash.cast("long").alias("simhash"))
