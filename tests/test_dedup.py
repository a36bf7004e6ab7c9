"""Dedup operators: exact, n-gram Jaccard, MinHash+LSH, SimHash."""

import pytest
from pyspark.sql import functions as F

from projet_graphdb_spark.functions import dedup

from conftest import SF_TINY


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_TINY}/documents.parquet")


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "A  b C"), (4, "other text")],
        ["doc_id", "text"],
    )
    out = {r["keep_id"]: r["n_dups"] for r in dedup.exact_dedup(df).collect()}
    # canonicalization: lowercase + whitespace-normalize → 1,2,3 identical
    assert out == {1: 3, 4: 1}


def test_word_shingles_basic(spark):
    df = spark.createDataFrame([("w1 w2 w3 w4",), ("",)], ["text"])
    rows = df.select(dedup.word_shingles(F.col("text"), 3).alias("sh")).collect()
    assert rows[0]["sh"] == ["w1 w2 w3", "w2 w3 w4"]
    assert rows[1]["sh"] == []


def test_ngram_jaccard_exact_small(spark):
    df = spark.createDataFrame(
        [
            (1, "x", "the quick brown fox jumps over the lazy dog"),
            (2, "x", "the quick brown fox jumps over the lazy cat"),
            (3, "x", "completely different words here entirely now"),
        ],
        ["doc_id", "blk", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, "blk", threshold=0.1).collect()
    }
    # docs 1,2 share 6 of their 7 trigrams each → J = 6/8
    assert pytest.approx(pairs[(1, 2)]) == 6 / 8
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_df_cap_drops_stop_shingles(spark):
    # every doc shares the stop-shingle "a a a"; with max_df=2 it must be
    # dropped from the index, so docs whose ONLY overlap is the stop
    # shingle never pair, and jaccard is over the capped sets
    df = spark.createDataFrame(
        [
            (1, "x", "a a a p q r"),
            (2, "x", "a a a p q r"),
            (3, "x", "a a a z z z"),
        ],
        ["doc_id", "blk", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, "blk", threshold=0.01, max_df=2).collect()
    }
    # shingles of doc1/2: {aaa,aap,apq,pqr}; aaa has df=3 > 2 → dropped;
    # capped sets are identical 3-element sets → J=1.0
    assert pytest.approx(pairs[(1, 2)]) == 1.0
    # doc3 overlaps 1/2 only via the dropped stop shingle
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_md5_family_matches_xxhash_verification(spark, docs):
    """md5 (oracle-portable) family: verified jaccard values still equal
    the exact set jaccard (hash family changes candidates, not values)."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs.withColumn("one", F.lit(1)), "one", threshold=0.5, max_df=None
        ).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5, hash="md5").collect()
    }
    for pair, j in approx.items():
        assert pytest.approx(j) == exact[pair]
    found = sum(1 for p in exact if p in approx)
    assert found >= 0.8 * len(exact)


def test_minhash_lsh_finds_bruteforce_pairs(spark, docs):
    """LSH recall sanity: high-Jaccard pairs must survive the banding."""
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs.withColumn("one", F.lit(1)), "one", threshold=0.5, max_df=None
        ).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # verification step computes EXACT jaccard on candidates → values match
    for pair, j in approx.items():
        assert pytest.approx(j) == exact[pair]
    # banding with 8 bands / 4 rows catches J>=0.5 pairs w.h.p.
    found = sum(1 for p in exact if p in approx)
    assert found >= 0.8 * len(exact)


def test_simhash_deterministic_and_sensitive(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "entirely unrelated content about spark query engines"),
        ],
        ["doc_id", "text"],
    )
    t1 = {r["doc_id"]: r["simhash"] for r in dedup.simhash_table(df).collect()}
    t2 = {r["doc_id"]: r["simhash"] for r in dedup.simhash_table(df).collect()}
    assert t1 == t2  # deterministic

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(t1[1], t1[2]) < hamming(t1[1], t1[3])


def test_dup_clusters_transitive_and_singletons(spark):
    # A≈B and B≈C but A,C share less — the cluster must close transitively.
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (10, near + " one"),
            (11, near + " two"),
            (12, near + " three"),
            (13, "completely different words about distributed query planning"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in
           dedup.dup_clusters(df, threshold=0.5).collect()}
    assert out[10] == (10, True)
    assert out[11] == (10, False) and out[12] == (10, False)
    assert out[13] == (13, True)  # singleton keeps itself


def test_passage_dups_cross_document(spark):
    from projet_graphdb_spark.functions.dedup import passage_dups

    shared = " ".join(f"w{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, shared + " tail one two three four five six seven eight"),
            (2, shared),                       # first chunk identical to doc 1's
            (3, "totally different words here"),
        ],
        ["doc_id", "text"],
    )
    rows = passage_dups(docs, size=16, stride=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_copies"] == 2 and r["n_docs"] == 2 and r["keep_doc"] == 1


def test_simhash_pairs_exhaustive_below_band_bound(spark):
    """With bands=4 the banded candidates are EXHAUSTIVE for hd <= 3
    (pigeonhole): the output must equal brute-force pairs."""
    from itertools import combinations

    from projet_graphdb_spark.functions.dedup import simhash_pairs, simhash_table

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet").limit(120)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_table(docs, hash="md5").collect()}
    expect = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"], r["hd"])
        for r in simhash_pairs(docs, bands=4, hash="md5").collect()
    }
    assert got == expect and expect  # nonempty on the dup-seeded fixture


def test_hamming_band_pairs_rejects_degenerate_banding(spark):
    """Round-12 advice: bands > nbits gives width=0/mask=0 — every row
    would share band value 0 and the equi-join degenerates into an
    all-pairs self-join; a non-dividing band count silently drops the
    top bits from every band.  Both must fail loudly at entry."""
    st = spark.createDataFrame([(1, 5), (2, 7)], ["doc_id", "simhash"])
    with pytest.raises(ValueError, match="bands must be in"):
        dedup.hamming_band_pairs(st, nbits=64, bands=65)
    with pytest.raises(ValueError, match="bands must be in"):
        dedup.hamming_band_pairs(st, nbits=64, bands=0)
    with pytest.raises(ValueError, match="does not divide"):
        dedup.hamming_band_pairs(st, nbits=60, bands=8)
    # the supported constructions still plan fine
    dedup.hamming_band_pairs(st, nbits=64, bands=4).count()


def test_hamming_band_occupancy_gauge(spark):
    """The s31-shaped occupancy gauge over the Hamming tier's (band,
    value) keys (round-12 verdict item 6): per-band bucket stats on a
    hand-computable fixture — fingerprints chosen so band 0 has a hot
    bucket (3 rows share value 0xAB) and band 1 is uniform — and the
    candidate estimate equals Sigma c*(c-1)/2 exactly."""
    # nbits=32, bands=2 -> 16-bit bands: low half = band 0, high = band 1
    fps = [
        (1, (0x0001 << 16) | 0x00AB),
        (2, (0x0002 << 16) | 0x00AB),
        (3, (0x0003 << 16) | 0x00AB),   # band0 bucket 0xAB holds 3 rows
        (4, (0x0004 << 16) | 0x00CD),
        (5, (0x0005 << 16) | 0x00EF),
    ]
    st = spark.createDataFrame(fps, "doc_id long, simhash long")
    rows = {
        r["band"]: r
        for r in dedup.hamming_band_occupancy(
            st, nbits=32, bands=2, hot_share=0.5
        ).collect()
    }
    b0, b1 = rows[0], rows[1]
    assert b0["n_buckets"] == 3 and b0["n_rows"] == 5
    assert b0["max_bucket_rows"] == 3 and b0["top_bucket_share"] == 0.6
    assert b0["est_candidate_pairs"] == 3  # 3*2/2 + 0 + 0
    assert bool(b0["is_hot"]) is True      # 0.6 > 0.5
    assert b1["n_buckets"] == 5 and b1["max_bucket_rows"] == 1
    assert b1["est_candidate_pairs"] == 0 and bool(b1["is_hot"]) is False
    # the gauge prices the join the pairs path actually runs: its
    # candidate estimate bounds the verified pair count from above
    n_pairs = dedup.hamming_band_pairs(
        st, nbits=32, bands=2, max_hd=32, hash_col="simhash"
    ).count()
    total_est = b0["est_candidate_pairs"] + b1["est_candidate_pairs"]
    assert n_pairs <= total_est


def test_passage_fuzzy_dups_catches_recycled_paragraph(spark):
    para = "the quick brown fox jumps over the lazy dog again and again today"
    edited = para.replace("lazy", "sleepy")
    filler = " ".join(f"w{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, para + " " + filler),          # paragraph at chunk 0
            (2, filler + " " + edited),        # edited copy buried at chunk 2 (stride 8)
            (3, " ".join(f"z{i}" for i in range(30))),  # unrelated
        ],
        ["doc_id", "text"],
    )
    out = dedup.passage_fuzzy_dups(
        docs, size=16, stride=8, threshold=0.4, hash="md5"
    ).collect()
    doc_pairs = {(r["id_a"] // 10_000, r["id_b"] // 10_000) for r in out
                 if r["id_a"] // 10_000 != r["id_b"] // 10_000}
    # the recycled paragraph links docs 1 and 2; doc 3 links to nobody
    assert (1, 2) in doc_pairs
    assert all(3 not in p for p in doc_pairs)


def test_bloom_new_docs_exact_vs_anti_join(spark):
    corpus = spark.createDataFrame(
        [(1, "b a"), (2, "c c d")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        # 10 = dup of 1 under the bag fingerprint (same token set, reordered)
        # 11 = genuinely new; 12 = dup of 2 (distinct-set equal)
        [(10, "a b"), (11, "x y z"), (12, "d c")],
        "doc_id long, text string",
    )
    out = dedup.bloom_new_docs(spark, corpus, batch).collect()
    assert [r["doc_id"] for r in out] == [11]
    # exactness even with a tiny (collision-prone) bitmap: false
    # positives must be removed by the verify join
    tiny = dedup.bloom_new_docs(spark, corpus, batch, m_bits=8, n_hashes=2).collect()
    assert [r["doc_id"] for r in tiny] == [11]


def test_incremental_lsh_equals_batch_cross_cut(spark, docs):
    """The incremental index-join path must produce EXACTLY the
    shard×corpus subset of the batch pipeline's pairs — band keys are
    per-document, so candidates (and hence verified pairs) coincide."""
    is_new = F.col("source").isin("src0", "src1")
    new_batch = docs.where(is_new)
    corpus = docs.where(~is_new)
    inc = {
        (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in dedup.incremental_lsh_dups(
            corpus, new_batch, threshold=0.2
        ).collect()
    }
    new_ids = {r["doc_id"] for r in new_batch.select("doc_id").collect()}
    batch = dedup.minhash_lsh_pairs(docs, threshold=0.2).collect()
    cross = {
        (
            (r["id_a"], r["id_b"]) if r["id_a"] in new_ids else (r["id_b"], r["id_a"])
        ) + (round(r["jaccard"], 9),)
        for r in batch
        if (r["id_a"] in new_ids) != (r["id_b"] in new_ids)
    }
    assert inc == cross and inc  # nonempty on the dup-seeded fixture


def test_incremental_lsh_index_roundtrip(spark, docs, tmp_path):
    """A parquet-persisted lsh_band_index read back must drive the same
    pairs as the inline-built index (the production contract: index
    once, reuse per shard)."""
    is_new = F.col("source").isin("src0", "src1")
    new_batch = docs.where(is_new)
    corpus = docs.where(~is_new)
    path = str(tmp_path / "corpus_index")
    dedup.lsh_band_index(corpus).write.mode("overwrite").partitionBy(
        "band"
    ).parquet(path)
    persisted = dedup.incremental_lsh_dups(
        corpus, new_batch, threshold=0.2, index=spark.read.parquet(path)
    ).collect()
    inline = dedup.incremental_lsh_dups(corpus, new_batch, threshold=0.2).collect()
    key = lambda r: (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
    assert sorted(map(key, persisted)) == sorted(map(key, inline))


def test_ingest_decisions_consistent_with_pair_sets(spark, docs):
    """Every shard document gets exactly one status, and each status is
    exactly characterized by the two pair sets: dup_of_corpus ⟺ has a
    cross pair (keeper = min corpus partner); dup_in_batch ⟺ no cross
    pair but a smaller-id within-shard partner (keeper = min such);
    unique ⟺ neither (keeper = self)."""
    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    dec = {
        r["new_id"]: (r["status"], r["keeper_id"])
        for r in dedup.ingest_dedup_decisions(
            corpus, shard, threshold=0.2
        ).collect()
    }
    shard_ids = {r["doc_id"] for r in shard.select("doc_id").collect()}
    assert set(dec) == shard_ids
    cross = {}
    for r in dedup.incremental_lsh_dups(corpus, shard, threshold=0.2).collect():
        cross.setdefault(r["new_id"], []).append(r["corpus_id"])
    within = {}
    for r in dedup.minhash_lsh_pairs(shard, threshold=0.2).collect():
        within.setdefault(r["id_b"], []).append(r["id_a"])
    statuses = set()
    for nid, (status, keeper) in dec.items():
        statuses.add(status)
        if nid in cross:
            assert status == "dup_of_corpus" and keeper == min(cross[nid])
        elif nid in within:
            assert status == "dup_in_batch" and keeper == min(within[nid])
        else:
            assert status == "unique" and keeper == nid
    # the tiny fixture seeds corpus dups but no batch-only twins
    assert {"dup_of_corpus", "unique"} <= statuses


def test_ingest_decisions_all_three_statuses(spark):
    """Synthetic trio covering the full decision lattice: a corpus dup
    (corpus keeper beats the batch partner), a batch-only twin pair
    (smaller id keeps), and a unique document."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    shard = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),   # corpus dup
            (11, "one two three four five six seven"),     # batch twin (keeper)
            (12, "one two three four five six seven"),     # batch twin (dup)
            (13, "totally different words entirely here"), # unique
        ],
        "doc_id long, text string",
    )
    got = {
        r["new_id"]: (r["status"], r["keeper_id"])
        for r in dedup.ingest_dedup_decisions(
            corpus, shard, threshold=0.5
        ).collect()
    }
    assert got == {
        10: ("dup_of_corpus", 1),
        11: ("unique", 11),
        12: ("dup_in_batch", 11),
        13: ("unique", 13),
    }


def test_incremental_lsh_index_config_mismatch_raises(spark, docs):
    """A persisted index carries its LSH config as constant columns; a
    call with different params must fail loudly (a 16-band shard against
    an 8-band index would silently match nothing)."""
    is_new = F.col("source").isin("src0", "src1")
    new_batch = docs.where(is_new)
    corpus = docs.where(~is_new)
    idx = dedup.lsh_band_index(corpus, bands=8)
    with pytest.raises(ValueError, match="built with"):
        dedup.incremental_lsh_dups(
            corpus, new_batch, bands=16, threshold=0.2, index=idx
        )
    # an index stripped of its config columns is rejected outright
    with pytest.raises(ValueError, match="config columns"):
        dedup.incremental_lsh_dups(
            corpus, new_batch, threshold=0.2,
            index=idx.select("doc_id", "band", "bhash"),
        )


def test_lsh_index_append_multi_day_lifecycle(spark, docs, tmp_path):
    """Two ingest days against one growing index: day-1's unique
    keepers are appended (lsh_index_append reads the construction from
    the index's own config columns), and day-2's pairs against the
    grown index must equal a from-scratch index over corpus ∪ accepted
    — the next shard really sees yesterday's arrivals."""
    corpus = docs.where(~F.col("source").isin("src0", "src1"))
    day1 = docs.where(F.col("source") == "src0")
    day2 = docs.where(F.col("source") == "src1")
    path = str(tmp_path / "index")
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(path)
    dec1 = dedup.ingest_dedup_decisions(
        corpus, day1, threshold=0.2, index=spark.read.parquet(path)
    )
    accepted = day1.join(
        dec1.where(F.col("status") == "unique").select(
            F.col("new_id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    cfg = dedup.lsh_index_append(spark, path, accepted)
    assert cfg == {"num_hashes": 32, "bands": 8, "n": 3, "hash": "xxhash64"}
    corpus2 = corpus.unionByName(accepted)
    key = lambda r: (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
    got = sorted(map(key, dedup.incremental_lsh_dups(
        corpus2, day2, threshold=0.2, index=spark.read.parquet(path)
    ).collect()))
    want = sorted(map(key, dedup.incremental_lsh_dups(
        corpus2, day2, threshold=0.2
    ).collect()))
    assert got == want and got


def test_lsh_index_forget_removes_and_preserves_config(spark, docs, tmp_path):
    """Forgetting a corpus document must make it invisible to the next
    ingest (pairs equal a from-scratch index over corpus-minus) while
    config columns survive the rewrite so appends keep validating."""
    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    path = str(tmp_path / "index")
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(path)
    # forget the corpus side of every detected pair — the strongest cut
    pairs = dedup.incremental_lsh_dups(
        corpus, shard, threshold=0.2, index=spark.read.parquet(path)
    ).collect()
    assert pairs
    gone = spark.createDataFrame(
        [(r["corpus_id"],) for r in pairs], "doc_id long"
    )
    dedup.lsh_index_forget(spark, path, gone)
    corpus2 = corpus.join(gone, "doc_id", "left_anti")
    key = lambda r: (r["new_id"], r["corpus_id"], round(r["jaccard"], 9))
    got = sorted(map(key, dedup.incremental_lsh_dups(
        corpus2, shard, threshold=0.2, index=spark.read.parquet(path)
    ).collect()))
    want = sorted(map(key, dedup.incremental_lsh_dups(
        corpus2, shard, threshold=0.2
    ).collect()))
    assert got == want
    # config columns survived: append still validates and works
    cfg = dedup.lsh_index_append(spark, path, shard)
    assert cfg["num_hashes"] == 32


def test_ingest_edge_cases_empty_text_and_empty_shard(spark):
    """Empty-text documents carry no shingles → no band keys → never
    pair (null band hashes don't equi-join): they ingest as 'unique',
    matching the batch pipeline's no-signal semantics.  An empty shard
    yields empty outputs without erroring."""
    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "")], "doc_id long, text string"
    )
    shard = spark.createDataFrame(
        [(10, ""), (11, "a b c d e")], "doc_id long, text string"
    )
    dec = sorted(
        map(tuple, dedup.ingest_dedup_decisions(corpus, shard, threshold=0.2).collect())
    )
    assert dec == [(10, "unique", 10), (11, "dup_of_corpus", 1)]
    empty = shard.where(F.lit(False))
    assert dedup.incremental_lsh_dups(corpus, empty, threshold=0.2).count() == 0
    assert dedup.ingest_dedup_decisions(corpus, empty, threshold=0.2).count() == 0


def test_sequential_ingest_keeps_corpus_dup_free(spark, tmp_path):
    """Three random ingest days through the full lifecycle (decide →
    accept uniques → append to the index): the invariant that makes
    ingest dedup SOUND is that the accepted corpus stays pairwise
    dup-free under the SAME detector — every within-day twin was caught
    by dup_in_batch, every cross-day twin by dup_of_corpus against the
    grown index.  Random small-vocab docs force plenty of collisions."""
    import random

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(20)]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(12))
    docs = [(i, mk()) for i in range(10)]  # seed corpus: all distinct
    for i in range(10, 40):
        if rng.random() < 0.4:  # near-copy of an earlier doc: mutate one token
            toks = docs[rng.randrange(len(docs))][1].split()
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
            docs.append((i, " ".join(toks)))
        else:
            docs.append((i, mk()))
    corpus = spark.createDataFrame(docs[:10], "doc_id long, text string")
    path = str(tmp_path / "index")
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(path)
    accepted_all = corpus
    n_rejected = 0
    for lo in (10, 20, 30):
        shard = spark.createDataFrame(
            docs[lo:lo + 10], "doc_id long, text string"
        )
        dec = dedup.ingest_dedup_decisions(
            accepted_all, shard, threshold=0.5,
            index=spark.read.parquet(path),
        ).collect()
        keep = {r["new_id"] for r in dec if r["status"] == "unique"}
        n_rejected += len(dec) - len(keep)
        for r in dec:  # corpus-dup keepers must point at live documents
            if r["status"] == "dup_of_corpus":
                assert r["keeper_id"] in {
                    x["doc_id"] for x in accepted_all.select("doc_id").collect()
                }
        accepted = shard.where(F.col("doc_id").isin(keep))
        dedup.lsh_index_append(spark, path, accepted)
        accepted_all = accepted_all.unionByName(accepted).localCheckpoint()
    assert n_rejected > 0  # the small vocab really forced collisions
    # the accepted corpus is pairwise dup-free under the same detector
    assert dedup.minhash_lsh_pairs(accepted_all, threshold=0.5).count() == 0


def test_lsh_index_forget_everything_and_swap_reentrancy(spark, docs, tmp_path):
    """Purging the whole index is legal: the empty rewrite keeps the
    SCHEMA readable (ingest against it returns no pairs) while the
    config VALUES are gone, so a subsequent append correctly refuses
    and demands a rebuild.  The swap also tolerates leftover dirs from
    a crashed prior run (unique-token staging/old names)."""
    import os

    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    path = str(tmp_path / "index")
    dedup.lsh_band_index(corpus).write.partitionBy("band").parquet(path)
    # simulate a crashed prior forget's leftovers
    os.makedirs(path + ".old-deadbeef/junk")
    os.makedirs(path + ".staging-deadbeef")
    dedup.lsh_index_forget(spark, path, corpus.select("doc_id"))
    empty = spark.read.parquet(path)  # schema survived the empty rewrite
    assert {"doc_id", "band", "bhash"} <= set(empty.columns)
    assert empty.count() == 0
    # ingest against the purged index: validation skips (no config row),
    # no pairs emitted
    assert dedup.incremental_lsh_dups(
        corpus.where(F.lit(False)), shard, threshold=0.2, index=empty
    ).count() == 0
    # appending to a purged index refuses: the construction is unknowable
    with pytest.raises(ValueError, match="empty or lacks"):
        dedup.lsh_index_append(spark, path, shard)


def test_atomic_swap_failure_cleans_staging_and_sweeps_orphans(tmp_path):
    """A failed write_fn must not leak its staging dir (round-8 review:
    every failed forget left a <path>.staging-<token> tree), and entry
    sweeps STALE orphans from crashed runs — but never fresh ones (a
    concurrent run's live staging) and never a .old that is the only
    surviving copy (crash in the rename window)."""
    import os
    import time

    from projet_graphdb_spark.functions import fsutil

    path = str(tmp_path / "index")
    os.makedirs(path)

    def boom(staging):
        os.makedirs(staging + "/partial")
        raise RuntimeError("simulated write failure")

    with pytest.raises(RuntimeError, match="simulated"):
        fsutil.atomic_swap(path, boom)
    leftovers = [e for e in os.listdir(tmp_path) if ".staging-" in e]
    assert leftovers == []  # its own staging was cleaned on failure

    # stale STAGING orphans (mtime pushed past the sweep age) are swept
    # on entry; .old-* is never swept (round-9 advice: rename preserves
    # content mtimes, so a sibling swap's ms-old .old looks hours-quiet
    # and sweeping it in the rename window can destroy the only copy);
    # fresh staging dirs (concurrent run) survive — INCLUDING a live long write
    # whose top-level dir is old but whose inner files are fresh (Spark
    # staging writes only touch the top-level mtime at job start)
    stale_s = path + ".staging-stale0"
    stale_o = path + ".old-stale0"
    fresh_s = path + ".staging-fresh0"
    live_s = path + ".staging-livewrite"
    for d in (stale_s, stale_o, fresh_s):
        os.makedirs(d)
    os.makedirs(live_s + "/_temporary")
    with open(live_s + "/_temporary/part-0", "w") as f:
        f.write("in-flight task output")
    past = time.time() - fsutil._SWEEP_AGE_S - 60
    for d in (stale_s, stale_o, live_s, live_s + "/_temporary"):
        os.utime(d, (past, past))  # live_s top levels look old; its FILE is fresh

    def ok(staging):
        os.makedirs(staging)
        with open(staging + "/data", "w") as f:
            f.write("x")

    fsutil.atomic_swap(path, ok)
    names = set(os.listdir(tmp_path))
    assert os.path.basename(stale_s) not in names
    assert os.path.basename(stale_o) in names  # .old is never swept
    assert os.path.basename(fresh_s) in names  # live concurrent staging kept
    assert os.path.basename(live_s) in names  # fresh INNER file = live write
    assert os.path.exists(path + "/data")

    # crash-in-rename-window recovery material: when path is ABSENT, a
    # stale .old is the only copy of the data — entry must NOT sweep it
    import shutil

    shutil.rmtree(path)
    survivor = path + ".old-survivor"
    os.makedirs(survivor)
    os.utime(survivor, (past, past))
    fsutil.atomic_swap(path, ok)
    assert os.path.isdir(survivor)


def test_incremental_lsh_rejects_mixed_config_index(spark, docs):
    """An index grown by a raw write that bypassed lsh_index_append can
    hold rows from two LSH configs; a single-row config probe passes it
    silently (round-8 advice) — the distinct-based check must raise."""
    is_new = F.col("source").isin("src0", "src1")
    shard = docs.where(is_new)
    corpus = docs.where(~is_new)
    good = dedup.lsh_band_index(corpus)
    rogue = dedup.lsh_band_index(corpus, num_hashes=16, bands=4)
    mixed = good.unionByName(rogue)
    with pytest.raises(ValueError, match="different LSH configs"):
        dedup.incremental_lsh_dups(
            corpus, shard, threshold=0.2, index=mixed
        ).count()


def test_containment_detects_quote_in_superset(spark):
    short = "alpha beta gamma delta"
    long_ = short + " epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, short, "en"), (2, long_, "en"), (3, "unrelated words here now", "en")],
        "doc_id long, text string, lang string",
    )
    out = {(r["id_a"], r["id_b"]): r["containment"]
           for r in dedup.ngram_containment_pairs(docs, "lang", threshold=0.5).collect()}
    # short fully contained in long: containment(1→2) = 1.0
    assert out[(1, 2)] == 1.0
    # reverse direction diluted below threshold (2 of 8 shingles)
    assert (2, 1) not in out and (1, 3) not in out


def test_lsh_calibration_high_bucket_full_recall(spark):
    # near-identical docs land in the top jaccard bucket and banded
    # MinHash must catch all of them (the S-curve's right side)
    base = "w%d " * 30
    docs = spark.createDataFrame(
        [(1, (base % tuple(range(30))).strip(), "en"),
         (2, (base % tuple(range(30))).strip() + " extra", "en"),
         (3, "completely different text entirely", "en")],
        "doc_id long, text string, lang string",
    )
    truth = dedup.ngram_jaccard_pairs(docs, "lang", threshold=0.05)
    det = dedup.minhash_lsh_pairs(docs, threshold=0.05, hash="md5").select(
        "id_a", "id_b"
    ).collect()
    t = truth.collect()
    top = [r for r in t if r["jaccard"] >= 0.9]
    assert top and all(
        (r["id_a"], r["id_b"]) in {(d["id_a"], d["id_b"]) for d in det} for r in top
    )


def test_source_dup_matrix_counts_cross_source_pairs(spark):
    # same token set in different order counts as a dup pair
    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "c b a", "s2"), (3, "a b c", "s1"),
         (4, "x y z", "s3")],
        "doc_id long, text string, source string",
    )
    import __spark_entry__ as E

    # exercise via the bag fingerprint directly
    fp = docs.select(dedup.bag_fingerprint(F.col("text")).alias("fp"), "doc_id", "source")
    a = fp.select("fp", F.col("doc_id").alias("ia"), F.col("source").alias("sa"))
    b = fp.select("fp", F.col("doc_id").alias("ib"), F.col("source").alias("sb"))
    pairs = a.join(b, "fp").where(F.col("ia") < F.col("ib")).collect()
    keys = {(min(r["sa"], r["sb"]), max(r["sa"], r["sb"])) for r in pairs}
    assert ("s1", "s2") in keys and ("s1", "s1") in keys
    assert not any("s3" in k for k in keys)


def test_prefix_filter_equals_bruteforce(spark):
    """Prefix filtering loses NOTHING: pairs equal the brute-force
    shingle-Jaccard join on a random corpus (the exactness theorem)."""
    import numpy as np

    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        base = list(rng.choice(vocab, size=12))
        rows.append((i, " ".join(base)))
        if i % 4 == 0:  # planted near-dup
            mut = list(base)
            mut[0] = str(rng.choice(vocab))
            rows.append((100 + i, " ".join(mut)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dedup.prefix_filter_jaccard_pairs(docs, threshold=0.5).collect()}

    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    expect = {}
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            a, b = sh(ta), sh(tb)
            j = len(a & b) / len(a | b)
            if j >= 0.5:
                lo, hi = min(ia, ib), max(ia, ib)
                expect[(lo, hi)] = round(j, 6)
    assert got == expect and len(expect) > 0


def test_minhash_shared_config_mismatch_raises(spark, docs):
    """shared frames carry their build config; banding them under
    different num_hashes/n/hash must raise instead of silently slicing
    band keys from the wrong signature layout (round-5 ADVICE)."""
    shared = dedup.minhash_shared(docs, num_hashes=32, hash="md5")
    with pytest.raises(ValueError, match="built with"):
        dedup.minhash_lsh_pairs(docs, num_hashes=16, hash="md5", shared=shared)
    with pytest.raises(ValueError, match="built with"):
        dedup.minhash_lsh_pairs(docs, hash="xxhash64", shared=shared)
    # column-layout divergence must raise too (round-7 ADVICE): a shared
    # tuple built over a different id/text column hashed the wrong corpus
    with pytest.raises(ValueError, match="built with"):
        dedup.minhash_lsh_pairs(
            docs, hash="md5", shared=shared, text_col="other_text"
        )
    with pytest.raises(ValueError, match="built with"):
        dedup.minhash_lsh_pairs(
            docs, hash="md5", shared=shared, id_col="other_id"
        )
    # matching config still works and is plan-only until collected
    ok = dedup.minhash_lsh_pairs(docs, threshold=0.5, hash="md5", shared=shared)
    assert {"id_a", "id_b", "jaccard"} <= set(ok.columns)


def test_minhash_tuned_bands_tracks_threshold():
    """Band choice follows the S-curve midpoint (1/b)^(1/r): higher
    Jaccard thresholds want fewer, wider bands."""
    assert dedup.minhash_tuned_bands(32, 0.5) == 8
    assert dedup.minhash_tuned_bands(32, 0.25) == 16
    b_hi = dedup.minhash_tuned_bands(32, 0.85)
    b_lo = dedup.minhash_tuned_bands(32, 0.2)
    assert b_hi < b_lo
    assert 32 % b_hi == 0 and 32 % b_lo == 0


def _brute_hamming_pairs(fps: dict, max_hd: int) -> set:
    from itertools import combinations

    return {
        (a, b, bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1"))
        for a, b in combinations(sorted(fps), 2)
        if bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1") <= max_hd
    }


def _interleave_val(fp: int, nbits: int, bands: int, b: int) -> int:
    width = nbits // bands
    return sum(((fp >> (b + k * bands)) & 1) << k for k in range(width))


def test_hamming_interleave_band_arithmetic(spark):
    """The strided re-band extractor (band b = bits {b, b+bands, ...})
    matches the Python bit-gather exactly, including fingerprints with
    the sign bit set (shiftrightunsigned semantics)."""
    import random

    rng = random.Random(7)
    fps = {i: rng.getrandbits(64) for i in range(32)}
    fps[31] |= 1 << 63  # force a negative Spark long
    rows = [(i, fp - (1 << 64) if fp >= 1 << 63 else fp) for i, fp in fps.items()]
    st = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        r["doc_id"]: r["bv"]
        for r in st.select(
            "doc_id",
            dedup._band_values("simhash", 64, 4, interleave=True).alias("bv"),
        ).collect()
    }
    for i, fp in fps.items():
        expect = [_interleave_val(fp, 64, 4, b) for b in range(4)]
        assert got[i] == expect, f"doc {i}: {got[i]} != {expect}"


def test_hamming_reband_pair_set_invariance(spark):
    """Pigeonhole exhaustiveness is layout-invariant: identity and
    interleave bandings produce the SAME verified pair set for
    max_hd <= bands-1, and both equal brute force."""
    import random

    rng = random.Random(11)
    base = {i: rng.getrandbits(63) for i in range(20)}
    fps = dict(base)
    for i in range(20):  # twin with hd=1..3
        flip = 0
        for j in range(1 + i % 3):
            flip |= 1 << ((7 * i + 13 * j) % 63)
        fps[100 + i] = base[i] ^ flip
    st = spark.createDataFrame(
        [(i, fp) for i, fp in fps.items()], "doc_id long, simhash long"
    )
    expect = _brute_hamming_pairs(fps, max_hd=3)
    got_id = {
        (r["id_a"], r["id_b"], r["hd"])
        for r in dedup.hamming_band_pairs(st, nbits=64, bands=4).collect()
    }
    got_il = {
        (r["id_a"], r["id_b"], r["hd"])
        for r in dedup.hamming_band_pairs(
            st, nbits=64, bands=4, interleave=True
        ).collect()
    }
    assert got_id == expect and got_il == expect and expect


def test_hamming_reband_recovery_low_entropy(spark):
    """The m16 chain on the exact corpus shape m15 was built for: a
    constant top band (flat borders) trips is_hot at identity banding;
    the recovery re-bands to interleave, after which no band is hot,
    and the recovered pair set still equals brute force."""
    import random

    rng = random.Random(13)
    const_top = 0x5A5A << 48
    base = {i: const_top | rng.getrandbits(48) for i in range(24)}
    fps = dict(base)
    for i in range(24):
        fps[100 + i] = base[i] ^ (1 << ((5 * i) % 48))  # hd=1 twins
    st = spark.createDataFrame(
        [(i, fp) for i, fp in fps.items()], "doc_id long, simhash long"
    )
    occ_id = {
        r["band"]: r
        for r in dedup.hamming_band_occupancy(st, nbits=64, bands=4).collect()
    }
    assert bool(occ_id[3]["is_hot"]) and occ_id[3]["top_bucket_share"] == 1.0
    plan: dict = {}
    got = {
        (r["id_a"], r["id_b"], r["hd"])
        for r in dedup.hamming_reband_recovery(
            st, nbits=64, bands=4, plan_out=plan
        ).collect()
    }
    assert plan["layout"] == "interleave" and plan["hot_bands"] == [3]
    assert plan["hot_bands_after"] == []
    assert plan["est_pairs_interleave"] < plan["est_pairs_identity"]
    assert got == _brute_hamming_pairs(fps, max_hd=3) and got
    # healthy corpus: recovery keeps the identity layout, one gauge pass
    healthy = spark.createDataFrame(
        [(i, rng.getrandbits(63)) for i in range(40)],
        "doc_id long, simhash long",
    )
    plan2: dict = {}
    dedup.hamming_reband_recovery(healthy, nbits=64, bands=4, plan_out=plan2).count()
    assert plan2["layout"] == "identity" and plan2["hot_bands"] == []
    assert "est_pairs_interleave" not in plan2


def test_hamming_reband_policy_decision_row(spark):
    """The s33-shaped decision row for the Hamming tier: hot corpus ->
    ('reband', 'hot_bands:3'); healthy corpus -> ('keep', 'healthy')."""
    import random

    rng = random.Random(17)
    hot_rows = [
        (i, (0x5A5A << 48) | rng.getrandbits(48)) for i in range(16)
    ]
    hot = spark.createDataFrame(hot_rows, "doc_id long, simhash long")
    r = dedup.hamming_reband_policy(hot, nbits=64, bands=4).first()
    assert r["tier"] == "hamming" and r["decision"] == "reband"
    assert r["n_hot_bands"] == 1 and r["reason"] == "hot_bands:3"
    healthy = spark.createDataFrame(
        [(i, rng.getrandbits(63)) for i in range(40)],
        "doc_id long, simhash long",
    )
    r2 = dedup.hamming_reband_policy(healthy, nbits=64, bands=4).first()
    assert r2["decision"] == "keep" and r2["reason"] == "healthy"
    assert r2["n_hot_bands"] == 0


def test_hamming_reband_escalates_to_permutation(spark):
    """Round-14: a STRIDE-ALIGNED low-entropy pattern defeats the
    interleave layout (constant bits at stride `bands` land in ONE
    interleaved band) — the recovery must escalate to a seeded bit
    permutation, after which no band is hot and the pair set still
    equals brute force."""
    import random

    rng = random.Random(19)
    # constant bits: the full top identity band (48..63, hot under
    # identity) PLUS stride-4 bits 0,4,...,44 (hot under interleave:
    # all land in interleaved band 0)
    const_mask = 0
    for b in range(48, 64):
        const_mask |= 1 << b
    for b in range(0, 48, 4):
        const_mask |= 1 << b
    const_bits = 0x5A5A << 48  # stride-4 low bits constant at 0
    free = [b for b in range(64) if not (const_mask >> b) & 1]
    base = {}
    for i in range(24):
        fp = const_bits
        for b in free:
            fp |= rng.getrandbits(1) << b
        base[i] = fp
    fps = dict(base)
    for i in range(24):  # hd=1 twins flipping a FREE bit
        fps[100 + i] = base[i] ^ (1 << free[i % len(free)])
    rows = [(i, fp - (1 << 64) if fp >= 1 << 63 else fp)
            for i, fp in fps.items()]
    st = spark.createDataFrame(rows, "doc_id long, simhash long")
    # both fixed layouts are hot on this corpus
    assert any(r["is_hot"] for r in dedup.hamming_band_occupancy(
        st, nbits=64, bands=4).collect())
    assert any(r["is_hot"] for r in dedup.hamming_band_occupancy(
        st, nbits=64, bands=4, interleave=True).collect())
    plan: dict = {}
    got = {
        (r["id_a"], r["id_b"], r["hd"])
        for r in dedup.hamming_reband_recovery(
            st, nbits=64, bands=4, plan_out=plan
        ).collect()
    }
    assert plan["layout"].startswith("permutation:"), plan["trail"]
    assert plan["hot_bands_after"] == []
    assert plan["est_pairs_after"] < plan["est_pairs_identity"]
    assert [t["layout"] for t in plan["trail"][:2]] == [
        "identity", "interleave"
    ]
    assert got == _brute_hamming_pairs(fps, max_hd=3) and got
    # the permuted layout's pair join agrees with brute force directly
    seed = int(plan["layout"].split(":")[1])
    direct = {
        (r["id_a"], r["id_b"], r["hd"])
        for r in dedup.hamming_band_pairs(
            st, nbits=64, bands=4, perm_seed=seed
        ).collect()
    }
    assert direct == got
    # mutually exclusive layout args fail loudly
    with pytest.raises(ValueError, match="mutually exclusive"):
        dedup.hamming_band_pairs(
            st, nbits=64, bands=4, interleave=True, perm_seed=1
        )


def test_hamming_single_band_64bit_layouts(spark):
    """bands==1 over a 64-bit fingerprint (round-14 advice): every
    layout holds ALL bits in the one band, so the band value is just
    the raw fingerprint — and none of the arithmetic paths may build
    a 1<<63 place value or a (1<<64)-1 mask literal (both exceed
    Long.MAX).  The pigeonhole regime is max_hd==0: pairs are exact
    fingerprint collisions under every layout."""
    import random

    rng = random.Random(23)
    fps = {i: rng.getrandbits(64) for i in range(12)}
    fps[11] |= 1 << 63  # force a negative Spark long
    for i in range(4):  # exact twins
        fps[100 + i] = fps[i]
    rows = [(i, fp - (1 << 64) if fp >= 1 << 63 else fp)
            for i, fp in fps.items()]
    st = spark.createDataFrame(rows, "doc_id long, simhash long")
    raw = {r["doc_id"]: r["simhash"] for r in st.collect()}
    for layout in ({}, {"interleave": True}, {"perm_seed": 3}):
        vals = {
            r["doc_id"]: r["bv"]
            for r in st.select(
                "doc_id",
                dedup._band_values("simhash", 64, 1, **layout).alias("bv"),
            ).collect()
        }
        assert vals == {i: [fp] for i, fp in raw.items()}, layout
        got = {
            (r["id_a"], r["id_b"], r["hd"])
            for r in dedup.hamming_band_pairs(
                st, nbits=64, bands=1, **layout
            ).collect()
        }
        assert got == _brute_hamming_pairs(fps, max_hd=0) and got, layout


def test_reband_recovery_rejects_wide_hamming_ball(spark):
    """Round-14 advice: hamming_reband_recovery's set-equality claim
    only holds in the pigeonhole regime — a max_hd beyond bands-1
    would make the recovered pair set depend on the chosen layout, so
    it must fail loudly instead of returning layout-dependent rows."""
    st = spark.createDataFrame([(0, 1), (1, 2)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.hamming_reband_recovery(st, nbits=64, bands=4, max_hd=4)
    # the bound itself is fine
    dedup.hamming_reband_recovery(st, nbits=64, bands=4, max_hd=3).collect()


def _flat_border_corpus_shard(rng_seed=29, n=24):
    """Low-entropy fixture split into corpus (even ids) and shard
    (odd-id hd=1 twins of the corpus rows) — disjoint id domains."""
    import random

    rng = random.Random(rng_seed)
    const_top = 0x5A5A << 48
    corpus = {2 * i: const_top | rng.getrandbits(48) for i in range(n)}
    shard = {
        2 * i + 1: corpus[2 * i] ^ (1 << ((5 * i) % 48)) for i in range(n)
    }
    return corpus, shard


def test_hamming_band_index_persisted_lifecycle(spark, tmp_path):
    """Round-14 verdict item 1, generic tier: an auto-layout index
    built over a hot (flat-border) corpus embeds the recovered
    interleave layout; a shard joined through the READ-BACK sink must
    equal the shard×corpus cut of the batch pair join under that
    layout (== brute force, pigeonhole); appends band with the stored
    layout and day-2 sees day-1; forget + config validation hold."""
    corpus, shard = _flat_border_corpus_shard()

    def df(d):
        return spark.createDataFrame(
            [(i, fp - (1 << 64) if fp >= 1 << 63 else fp)
             for i, fp in d.items()],
            "doc_id long, simhash long",
        )

    path = str(tmp_path / "ham_idx")
    plan: dict = {}
    dedup.hamming_band_index(
        df(corpus), nbits=64, bands=4, layout="auto", plan_out=plan,
        join_cost_flops=3.0e8,
    ).write.partitionBy("band").parquet(path)
    assert plan["layout"] == "interleave" and plan["hot_bands"] == [3]
    index = spark.read.parquet(path)
    assert (
        index.select("_layout").distinct().collect()[0][0] == "interleave"
    )
    got = {
        (r["new_id"], r["corpus_id"], r["hd"])
        for r in dedup.incremental_hamming_dups(
            df(shard), index, nbits=64, bands=4
        ).collect()
    }
    brute = _brute_hamming_pairs({**corpus, **shard}, max_hd=3)
    want = {
        (b, a, hd) if b % 2 else (a, b, hd)
        for a, b, hd in brute
        if (a % 2) != (b % 2)  # shard×corpus cut only
    }
    want = {(s, c, hd) for s, c, hd in want if s % 2 == 1}
    assert got == want and got
    # day-2: append the shard (stored layout + join-cost stamp carried),
    # then a new batch must see day-1 rows through the grown index
    cfg = dedup.hamming_index_append(spark, path, df(shard))
    assert cfg == {"nbits": 64, "bands": 4, "layout": "interleave"}
    grown = spark.read.parquet(path)
    jcs = grown.select("_join_cost_flops").distinct().collect()
    assert len(jcs) == 1 and jcs[0][0] == 3.0e8
    day2 = {1001: shard[1] ^ 0}  # exact dup of shard id 1
    got2 = {
        (r["new_id"], r["corpus_id"], r["hd"])
        for r in dedup.incremental_hamming_dups(
            df(day2), grown, nbits=64, bands=4
        ).collect()
    }
    assert (1001, 1, 0) in got2  # sees the day-1 append
    # forget is the generic anti-join; config columns survive
    dedup.lsh_index_forget(
        spark, path, spark.createDataFrame([(1,)], "doc_id long")
    )
    after = spark.read.parquet(path)
    assert after.where(F.col("doc_id") == 1).count() == 0
    assert after.select("_layout").distinct().collect()[0][0] == "interleave"
    # fail-loudly: wrong geometry, missing config, pigeonhole bound
    with pytest.raises(ValueError, match="bands=4"):
        dedup.incremental_hamming_dups(df(day2), after, nbits=64, bands=8)
    with pytest.raises(ValueError, match="config columns"):
        dedup.incremental_hamming_dups(
            df(day2), after.drop("_layout"), nbits=64, bands=4
        )
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.incremental_hamming_dups(
            df(day2), after, nbits=64, bands=4, max_hd=4
        )
    # mixed-config sink (raw write bypassing the append) is rejected
    dedup.hamming_band_index(
        df(day2), nbits=64, bands=4, layout="identity",
        join_cost_flops=3.0e8,
    ).write.mode("append").partitionBy("band").parquet(path)
    with pytest.raises(ValueError, match="different"):
        dedup.incremental_hamming_dups(
            df(shard), spark.read.parquet(path), nbits=64, bands=4
        )


def test_hamming_gauge_ledger_lifecycle(spark, tmp_path):
    """Round-14 verdict item 6: the persisted gauge ledger turns
    "is_hot now" into "hot since when".  Three runs — healthy, hot,
    hot — must report hot_since = the second run for the saturated
    band; a replayed run_seq overwrites its own partition
    (idempotent), and a healthy-as-of-latest band reports NULL."""
    import random

    rng = random.Random(31)
    healthy = spark.createDataFrame(
        [(i, rng.getrandbits(63)) for i in range(40)],
        "doc_id long, simhash long",
    )
    corpus, _ = _flat_border_corpus_shard()
    hot = spark.createDataFrame(
        [(i, fp) for i, fp in corpus.items()], "doc_id long, simhash long"
    )
    path = str(tmp_path / "ledger")
    dedup.hamming_gauge_ledger_append(spark, path, healthy, 64, 4, run_seq=1)
    dedup.hamming_gauge_ledger_append(spark, path, hot, 64, 4, run_seq=2)
    dedup.hamming_gauge_ledger_append(spark, path, hot, 64, 4, run_seq=3)
    # idempotent replay: same run, same gauge, no duplicate rows
    dedup.hamming_gauge_ledger_append(spark, path, hot, 64, 4, run_seq=3)
    ledger = spark.read.parquet(path)
    assert ledger.count() == 12  # 3 runs x 4 bands
    rep = {
        r["band"]: r
        for r in dedup.hamming_gauge_ledger_report(ledger).collect()
    }
    assert rep[3]["is_hot_now"] and rep[3]["hot_since"] == 2
    assert rep[3]["n_hot_runs"] == 2 and rep[3]["n_runs"] == 3
    assert not rep[0]["is_hot_now"] and rep[0]["hot_since"] is None
    # a band hot in the past but healthy latest: runs hot, hot, healthy
    path2 = str(tmp_path / "ledger2")
    dedup.hamming_gauge_ledger_append(spark, path2, hot, 64, 4, run_seq=1)
    dedup.hamming_gauge_ledger_append(spark, path2, hot, 64, 4, run_seq=2)
    dedup.hamming_gauge_ledger_append(
        spark, path2, healthy, 64, 4, run_seq=3
    )
    rep2 = {
        r["band"]: r
        for r in dedup.hamming_gauge_ledger_report(
            spark.read.parquet(path2)
        ).collect()
    }
    assert not rep2[3]["is_hot_now"] and rep2[3]["hot_since"] is None
    assert rep2[3]["n_hot_runs"] == 2
