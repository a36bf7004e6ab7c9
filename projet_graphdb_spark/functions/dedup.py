"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the point of each variant):

* ``exact_dedup`` — one hash-aggregate over a fingerprint: a single
  shuffle on md5(text), the cheapest possible full-corpus dedup.
* ``ngram_jaccard_pairs`` — *blocked* exact near-dup: all-pairs Jaccard
  inside small blocks (e.g. a language or source partition).  Quadratic
  only within a block; the self-join shuffles on the block key, so block
  sizing is the scale knob.
* ``minhash_lsh_pairs`` — the sub-quadratic scale path: shingle →
  MinHash signature (map-only) → banded LSH bucket join (shuffle on
  band hash, candidates only) → exact verification of candidates.
  100 TB-safe: cost is O(corpus) + O(candidate pairs), never all-pairs.
* ``simhash64`` — 64-bit near-dup fingerprint; hamming-close fingerprints
  ≈ similar docs.  Map-only signature; pairing via band join on nibbles.

All signatures use built-in hash functions (xxhash64/crc32) inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import fingerprint

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One keeper (min id) per distinct canonical text.

    Output: (fp, keep_id, n_dups).  Single shuffle on the fingerprint.
    """
    return (
        docs.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text (array<string>).

    NOTE: higher-order functions are CodegenFallback (interpreted) in
    Spark, and interpreted lambdas re-evaluate captured subtrees per
    element — referencing this whole expression inside another lambda
    re-runs the split per shingle.  Prefer ``shingle_frame`` which
    materializes tokens/shingles behind checkpoints.
    """
    return shingles_of_tokens(F.split(F.trim(text), r"\s+"), text, n)


def shingles_of_tokens(toks: Column, text: Column, n: int) -> Column:
    # slide an n-window over token positions; empty text → empty array
    return F.array_distinct(
        F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


def shingle_frame(
    docs: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
    extra_cols: list = (),
) -> DataFrame:
    """(id, *extra, _sh) with shingles MATERIALIZED (eager checkpoint).

    Two stages, each behind a barrier, so that every downstream lambda
    captures a plain attribute: (1) tokens from one split per row,
    (2) shingles sliding over the token attribute.  Without the barriers
    Catalyst collapses the projections and interpreted HOFs re-split the
    text once per element (quadratic per row, catastrophic when nested).
    """
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.col(text_col).alias("_txt"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
    ).localCheckpoint(eager=True)
    return toks.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        shingles_of_tokens(F.col("_toks"), F.col("_txt"), n).alias("_sh"),
    ).localCheckpoint(eager=True)


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_col: str,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs word-n-gram Jaccard similarity within blocks
    (threshold > 0), via an inverted shingle index.

    Output: (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    """
    # INVERTED-INDEX formulation: explode (doc, shingle-hash) postings,
    # equi-join postings on (block, shingle), count shared shingles per
    # pair = |intersection|, union from precomputed set sizes.  Compared
    # to the all-pairs array_intersect join this (a) never materializes
    # per-pair array copies, (b) builds no per-pair hash set (Spark's
    # array_intersect allocates an OpenHashSet per invocation), and
    # (c) shuffles on the high-cardinality (block, shingle) key — full
    # parallelism and AQE skew-splitting at any scale, no broadcast
    # needed.  Pairs sharing zero shingles never appear, which is exactly
    # the jaccard < threshold case (threshold > 0).
    # Shingles are hashed to longs first: xxhash64 collisions are
    # negligible (P ≈ |vocab|²/2⁶⁵), so values equal the exact
    # string-set Jaccard the DuckDB oracle computes.
    postings = (
        shingle_frame(docs, n, id_col, text_col, [block_col])
        .select(
            F.col(id_col).alias("_did"),
            F.col(block_col).alias("_blk"),
            F.transform(F.col("_sh"), lambda s: F.xxhash64(s)).alias("_shh"),
        )
        .select(
            "_did", "_blk", F.size("_shh").alias("_sz"), F.explode("_shh").alias("_s")
        )
    )
    a = postings.select(
        "_blk", "_s", F.col("_did").alias("id_a"), F.col("_sz").alias("sz_a")
    )
    b = postings.select(
        "_blk", "_s", F.col("_did").alias("id_b"), F.col("_sz").alias("sz_b")
    )
    inter = (
        a.join(b, on=["_blk", "_s"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    union = F.col("sz_a") + F.col("sz_b") - F.col("_i")
    jac = F.col("_i").cast("double") / union.cast("double")
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_signature_of_shingles(sh: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<long>, length ``num_hashes``) over a
    MATERIALIZED shingle array column.

    Multiply-shift universal hashing, h_i(s) = bits 29..59 of
    (a_i * h31(s) + b_i) with h31 = 31-bit truncated xxhash64;
    signature[i] = min over the doc's shingles.  Division-free on
    purpose: interpreted ANSI ``%``/``/`` go through DivModLike.eval,
    which is an order of magnitude slower than shift/mask in the hot
    loop.  Operands stay below 2^62, so ANSI overflow checks never fire.
    Coefficients come from a fixed deterministic sequence so signatures
    are reproducible across runs.  ``sh`` must be a plain attribute (see
    ``shingle_frame``): each of the ``num_hashes`` parts re-evaluates
    its captured subtree under interpreted HOF evaluation, which is only
    cheap for an attribute.
    """
    mask31 = (1 << 31) - 1
    hashes = F.transform(sh, lambda s: F.xxhash64(s).bitwiseAND(F.lit(mask31)))

    def perm(a: int, bconst: int):
        # factory closure: PySpark inspects lambda arity, so the hash
        # coefficients must NOT appear as (defaulted) lambda parameters
        return lambda h: F.shiftright(h * F.lit(a) + F.lit(bconst), 29).bitwiseAND(
            F.lit(mask31)
        )

    sig_parts = []
    for i in range(num_hashes):
        # deterministic "random" odd coefficients derived from i
        a = ((2 * i + 1) * 0x9E3779B97F4A7C15) & mask31 or 1
        bconst = (i * 0xC2B2AE3D27D4EB4F + 0x165667B19E3779F9) & mask31
        sig_parts.append(F.array_min(F.transform(hashes, perm(a, bconst))))
    return F.array(*sig_parts)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-quadratic near-dup pairs: MinHash signatures → banded LSH
    bucket join → exact Jaccard verification of candidates only.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    base = (
        shingle_frame(docs, n, id_col, text_col)
        .select(
            F.col(id_col).alias("_did"),
            # hashed shingle set for the exact-verification step (long
            # arrays intersect much faster than string arrays)
            F.transform(F.col("_sh"), lambda s: F.xxhash64(s)).alias("_sh"),
            minhash_signature_of_shingles(F.col("_sh"), num_hashes).alias("_sig"),
        )
        .localCheckpoint(eager=True)  # signatures computed once, not per band/pair
    )
    # band key: (band index, hash of that band's signature slice)
    banded = base.select(
        "_did",
        "_sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("_sig"), bi * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("bhash"),
                ),
            )
        ).alias("_b"),
    ).select("_did", "_sh", F.col("_b.band").alias("band"), F.col("_b.bhash").alias("bhash"))

    a = banded.select(
        "band", "bhash", F.col("_did").alias("id_a"), F.col("_sh").alias("sh_a")
    )
    b = banded.select(
        "band", "bhash", F.col("_did").alias("id_b"), F.col("_sh").alias("sh_b")
    )
    cand = (
        a.join(b, on=["band", "bhash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])  # same pair can collide in several bands
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return cand.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


# Per-bit majority vote of shingle hashes: bit b of the result is 1 iff
# sum over shingles of (+1 if hash bit b set else -1) > 0.  Nested SQL
# lambdas keep the expression tree compact (vs unrolling 64 Python-side).
_SIMHASH_EXPR = """
aggregate(
  zip_with(
    transform(sequence(0, 63),
              bit -> aggregate(_hs, 0L,
                               (acc, h) -> acc + IF(((h >> bit) & 1) = 1, 1L, -1L))),
    transform(sequence(0, 63), bit -> shiftleft(1L, bit)),
    (vote, pw) -> IF(vote > 0, pw, 0L)),
  0L, (acc, x) -> acc + x)
"""


def simhash_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3) -> DataFrame:
    """64-bit SimHash per document (long column ``simhash``)."""
    sh = shingle_frame(docs, n, id_col, text_col)
    hs = sh.select(
        F.col(id_col), F.transform(F.col("_sh"), lambda s: F.xxhash64(s)).alias("_hs")
    ).localCheckpoint(eager=True)  # the 64 per-bit aggregates each re-read _hs
    return hs.select(F.col(id_col), F.expr(_SIMHASH_EXPR).alias("simhash"))
