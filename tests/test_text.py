"""Text analysis operators vs plain-Python reference implementations."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from projet_graphdb_spark.functions import text

from conftest import SF_TINY


SAMPLES = [
    (1, "the quick brown fox and the lazy dog of honor"),
    (2, "le chat et la porte avec le pain les amis"),
    (3, "der hund und das auto und der baum"),
    (4, "el mundo que los ninos y el sol"),
    (5, ""),
    (6, "   "),
    (7, "single"),
    (8, "a  b   c"),  # multi-space
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(SAMPLES, ["doc_id", "text"])


@pytest.fixture(scope="module")
def stats(docs):
    return {r["doc_id"]: r.asDict() for r in text.text_stats(docs).collect()}


def py_tokens(t):
    t = t.strip()
    return t.split() if t else []


def test_token_count(stats):
    for did, t in SAMPLES:
        assert stats[did]["n_tokens"] == len(py_tokens(t)), (did, t)


def test_char_count(stats):
    for did, t in SAMPLES:
        assert stats[did]["n_chars"] == len(t)


def test_avg_token_len(stats):
    for did, t in SAMPLES:
        toks = py_tokens(t)
        if toks:
            expect = sum(len(x) for x in toks) / len(toks)
            assert stats[did]["avg_token_len"] == pytest.approx(expect)
        else:
            assert stats[did]["avg_token_len"] is None


def test_lang_id(stats):
    assert stats[1]["lang_pred"] == "en"
    assert stats[2]["lang_pred"] == "fr"
    assert stats[3]["lang_pred"] == "de"
    assert stats[4]["lang_pred"] == "es"
    assert stats[5]["lang_pred"] == "und"
    assert stats[7]["lang_pred"] == "und"


def test_fingerprint_canonicalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO WORLD  ")],
        ["doc_id", "text"],
    )
    fps = [r["fp"] for r in df.select(text.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[0] == hashlib.md5(b"hello world").hexdigest()


def test_quality_score_range(stats):
    for did, _ in SAMPLES:
        q = stats[did]["quality"]
        assert 0.0 <= q <= 1.0


def test_bpe_ish_lower_bound(stats):
    for did, t in SAMPLES:
        assert stats[did]["n_tokens_bpe"] >= stats[did]["n_tokens"]


def test_token_shards_greedy_packing(spark):
    # 5 docs of 3 tokens each in one group, budget 6: shards 0,0,1,1,2
    rows = [(i, "a b c", "en") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["shard"] for r in text.token_shards(df, tokens_per_shard=6).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}, out


def test_token_shards_groups_independent(spark):
    rows = [(0, "a b c", "en"), (1, "a b c", "fr"), (2, "a b c", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r["lang"], r["doc_id"]): r["shard"]
           for r in text.token_shards(df, tokens_per_shard=4).collect()}
    # each language packs from shard 0 independently
    assert out == {("en", 0): 0, ("en", 2): 0, ("fr", 1): 0}, out


def test_token_shards_oversize_doc_gets_own_shard(spark):
    rows = [(0, "a b c d e f g h", "en"), (1, "a b", "en"), (2, "a b", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["shard"] for r in text.token_shards(df, tokens_per_shard=4).collect()}
    # doc 0 (8 tokens) occupies shards 0-1 worth of budget; doc 1 starts at
    # floor(8/4)=2, doc 2 at floor(10/4)=2
    assert out == {0: 0, 1: 2, 2: 2}, out


def test_hash_split_dups_same_split_and_ratios(spark):
    from projet_graphdb_spark.functions.text import hash_split

    df = spark.createDataFrame(
        [(1, "same doc text"), (2, "Same  DOC text"), (3, "another one")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(df).collect()}
    # canonicalization: 1 and 2 are content-identical -> same bucket/split
    assert out[1] == out[2]

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    splits = {r["split"]: r["n"] for r in
              hash_split(docs).groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(splits.values())
    assert 0.7 <= splits.get("train", 0) / total <= 0.9


def test_top_ngrams_counts_document_frequency(spark):
    from projet_graphdb_spark.functions.text import top_ngrams

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c"), (3, "x y z")],  # "a b c" df=2 (distinct per doc)
        ["doc_id", "text"],
    )
    rows = top_ngrams(df, n=3, k=3).collect()
    assert rows[0]["ngram"] == "a b c" and rows[0]["df"] == 2


def test_repetition_signals_hand_computed(spark):
    from projet_graphdb_spark.functions.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a a a a"),            # 1 distinct of 4; bigrams: "a a" x3 -> dup 2/3
            (2, "a b c d"),            # all distinct, no dup bigrams
            (3, "x"),                  # single word: dup_bigram_frac defined as 0
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert abs(r1["distinct_frac"] - 0.25) < 1e-12
    assert abs(r1["dup_bigram_frac"] - (1 - 1 / 3)) < 1e-12
    assert abs(r1["top_word_frac"] - 1.0) < 1e-12
    r2 = out[2]
    assert r2["distinct_frac"] == 1.0 and r2["dup_bigram_frac"] == 0.0
    assert abs(r2["top_word_frac"] - 0.25) < 1e-12
    r3 = out[3]
    assert r3["n_words"] == 1 and r3["dup_bigram_frac"] == 0.0


def test_bm25_ranks_rare_terms_higher(spark):
    from projet_graphdb_spark.functions.text import bm25_topk
    import math

    df = spark.createDataFrame(
        [
            (1, "rare word here"),
            (2, "common word here"),
            (3, "common word again"),
            (4, "common stuff only"),
            (5, "nothing relevant at all"),
        ],
        ["doc_id", "text"],
    )
    rows = bm25_topk(df, terms=["rare", "common"], k=10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert 5 not in got  # no matching term -> filtered
    assert rows[0]["doc_id"] == 1  # rare term beats common term
    # hand-check doc 1: tf=1, dl=3, N=5, avgdl=3.2, df(rare)=1
    idf = math.log((5 - 1 + 0.5) / (1 + 0.5) + 1)
    norm = 1.2 * (1 - 0.75 + 0.75 * 3 / 3.2)
    expect = round(idf * 1 * 2.2 / (1 + norm), 6)
    assert abs(got[1] - expect) < 1e-9


def test_contamination_detects_overlap(spark):
    from projet_graphdb_spark.functions.text import contamination

    # deterministic split boundaries: force bucket by picking train_pct=100
    # then 0 — instead exercise semantics with a controlled split via
    # train_pct tuning is fragile; use enough docs that both splits occur.
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    out = contamination(docs).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_contaminated"] <= r["n_shingles"]
        if r["n_shingles"]:
            assert abs(r["contamination_frac"] - r["n_contaminated"] / r["n_shingles"]) < 1e-12
    # the synthetic corpus shares vocabulary across splits -> some hit > 0
    assert any(r["n_contaminated"] > 0 for r in out)


def test_redact_pii_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.org or call 555-123-4567 ok"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.net"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.redact_pii(df).collect()}
    assert out[1]["n_redacted"] == 2
    assert out[2]["n_redacted"] == 0
    assert out[3]["n_redacted"] == 2
    exp1 = "mail me at [PII] or call [PII] ok"
    assert out[1]["clean_chars"] == len(exp1)
    assert out[1]["redacted_fp"] == hashlib.md5(exp1.encode()).hexdigest()
    # untouched text keeps its own fingerprint
    assert out[2]["redacted_fp"] == hashlib.md5(b"no pii here at all").hexdigest()


def test_chunk_passages_windows(spark):
    words = [f"w{i}" for i in range(20)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short doc"), (3, "")], ["doc_id", "text"]
    )
    rows = text.chunk_passages(df, size=16, stride=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
    # doc 1: 20 tokens -> starts 1, 9, 17
    c1 = by_doc[1]
    assert [(r["start_token"], r["n_tokens"]) for r in c1] == [(1, 16), (9, 12), (17, 4)]
    assert c1[0]["chunk_fp"] == hashlib.md5(" ".join(words[:16]).encode()).hexdigest()
    assert c1[1]["chunk_fp"] == hashlib.md5(" ".join(words[8:20]).encode()).hexdigest()
    # short and empty docs yield exactly one chunk
    assert [(r["start_token"], r["n_tokens"]) for r in by_doc[2]] == [(1, 2)]
    assert len(by_doc[3]) == 1


def test_hash_sample_nested_and_dup_stable(spark):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    s10 = {r["doc_id"] for r in text.hash_sample(docs, pct=10).collect()}
    s20 = {r["doc_id"] for r in text.hash_sample(docs, pct=20).collect()}
    assert s10 and s10 <= s20  # nested subsets
    # exact duplicates sample together: same text -> same bucket
    dup = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "other words")],
        ["doc_id", "text"],
    )
    for pct in (0, 30, 60, 100):
        got = {r["doc_id"] for r in text.hash_sample(dup, pct=pct).collect()}
        assert (1 in got) == (2 in got), pct


def test_char_entropy_known_values(spark):
    import math

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, ""), (4, "abcd")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in text.char_entropy(df).collect()}
    assert got[1]["entropy_bits"] == 0.0 and got[1]["n_chars"] == 4
    assert got[2]["entropy_bits"] == 1.0          # two equiprobable chars
    assert got[3]["entropy_bits"] == 0.0 and got[3]["n_chars"] == 0
    assert got[4]["entropy_bits"] == round(math.log2(4), 6)  # = 2.0


def test_doc_frequency_counts_docs_not_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "spark spark spark join"), (2, "spark join join"), (3, "scan"), (4, "")],
        ["doc_id", "text"],
    )
    got = {r["token"]: (r["df"], r["idf"]) for r in text.doc_frequency(df, min_df=1).collect()}
    # repeated in-doc tokens count once; the empty doc contributes nothing
    assert got["spark"][0] == 2 and got["join"][0] == 2 and got["scan"][0] == 1
    import math
    assert got["scan"][1] == round(math.log(4 / 1), 6)
    assert got["spark"][1] == round(math.log(4 / 2), 6)
    # min_df prunes the hapax tail
    pruned = {r["token"] for r in text.doc_frequency(df, min_df=2).collect()}
    assert pruned == {"spark", "join"}


def test_stratified_sample_cap_and_determinism(spark):
    rows = [(i, "en" if i % 3 else "fr") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out1 = text.stratified_sample(df, strata=("lang",), cap=10).collect()
    out2 = text.stratified_sample(df, strata=("lang",), cap=10).collect()
    assert sorted((r["doc_id"], r["sample_rank"]) for r in out1) == sorted(
        (r["doc_id"], r["sample_rank"]) for r in out2
    )
    by_lang = {}
    for r in out1:
        by_lang.setdefault(r["lang"], []).append(r["sample_rank"])
    assert all(len(v) == 10 and sorted(v) == list(range(1, 11)) for v in by_lang.values())
    # nested-cap property: the cap-5 sample is a prefix of the cap-10 one
    small = {r["doc_id"] for r in text.stratified_sample(df, strata=("lang",), cap=5).collect()}
    big = {r["doc_id"] for r in out1}
    assert small < big


def test_quality_filter_first_failing_gate(spark):
    long_good = " ".join(["alpha the and beta"] * 20)    # 80 tokens, stopwordy
    df = spark.createDataFrame(
        [
            (1, long_good),
            (2, "tiny doc"),                             # too_short
            (3, " ".join(["word"] * 2000)),              # too_long
            (4, " ".join(["zx"] * 50)),                  # avg len 2 -> token_shape
            (5, " ".join(["jqxzkwvp"] * 25)),            # shape ok, no stopwords
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["keep"], r["reject_reason"])
           for r in text.quality_filter(df).collect()}
    assert got[2] == (False, "too_short")
    assert got[3] == (False, "too_long")
    assert got[4] == (False, "token_shape")
    assert got[5][0] is False and got[5][1] == "low_quality"
    assert got[1] == (True, None)


def test_partitioned_corpus_prunes_partitions(spark, tmp_path):
    rows = [(i, "t" * (i + 1), "en" if i % 2 else "fr", f"s{i % 3}") for i in range(12)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = str(tmp_path / "parts")
    got = text.partitioned_corpus_stats(docs, out, lang="en")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the language predicate must be a PARTITION filter on the scan
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:120]
    res = {r["source"]: (r["n_docs"], r["total_chars"]) for r in got.collect()}
    odd = [r for r in rows if r[2] == "en"]
    import collections
    exp = collections.defaultdict(lambda: [0, 0])
    for i, t, _, s in odd:
        exp[s][0] += 1
        exp[s][1] += len(t)
    assert res == {k: tuple(v) for k, v in exp.items()}
    # the written layout is hive-partitioned by lang
    import os
    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) == ["lang=en", "lang=fr"]


def test_unigram_logprob_matches_hand_computation(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.unigram_logprob(docs).collect()}
    # corpus: a=2, b=2, total=4 → p(a)=p(b)=0.5
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 1
    assert out[1]["avg_logprob"] == round(math.log(0.5), 6)
    assert out[2]["avg_logprob"] == round(math.log(0.5), 6)


def test_tfidf_cosine_pairs_identical_docs_score_one(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana cherry"), (2, "apple banana cherry"),
         (3, "dog elephant fox"), (4, "apple zebra yak")],
        "doc_id long, text string",
    )
    out = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in text.tfidf_cosine_pairs(docs, threshold=0.0, max_df=None).collect()}
    assert out[(1, 2)] == 1.0          # identical docs
    assert (1, 3) not in out           # no shared token → pair never appears
    assert 0.0 < out[(1, 4)] < 1.0     # one shared token


def test_source_kl_divergence_zero_for_identical_mix(spark):
    import math

    docs = spark.createDataFrame(
        [("s1", "a b"), ("s2", "a b"), ("s3", "a a")],
        "source string, text string",
    )
    out = {r["source"]: r for r in text.source_kl_divergence(docs).collect()}
    # corpus: a=4, b=2 → q(a)=2/3, q(b)=1/3
    # s1, s2 have p(a)=p(b)=1/2; s3 has p(a)=1
    assert out["s1"]["kl"] == out["s2"]["kl"] != 0.0
    expected_s3 = round(1.0 * math.log(1.0 / (4 / 6)), 6)
    assert out["s3"]["kl"] == expected_s3
    assert out["s1"]["n_tokens"] == 2


def test_span_corruption_plan_deterministic_runs(spark):
    docs = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")], "doc_id long, text string"
    )
    a = text.span_corruption_plan(docs, mask_pct=50).collect()
    b = text.span_corruption_plan(docs, mask_pct=50).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # reproducible
    # spans are disjoint, ordered, within bounds, and runs are contiguous
    prev_end = -2
    for r in a:
        assert r["start_pos"] > prev_end + 1 or prev_end == -2
        assert 0 <= r["start_pos"] <= r["end_pos"] <= 9
        assert r["n_tokens"] == r["end_pos"] - r["start_pos"] + 1
        prev_end = r["end_pos"]
    # ~50% masked in expectation; with 10 tokens demand at least one span
    assert len(a) >= 1


def test_decontaminated_train_flags_overlapping_doc(spark):
    # hash_split assigns by content hash; craft a corpus where one train
    # doc equals a test doc's text except for a tiny suffix, then check
    # the overlap math rather than fixed split membership
    docs = spark.createDataFrame(
        [(i, f"unique text number {i} with words w{i} x{i} y{i} z{i}")
         for i in range(40)],
        "doc_id long, text string",
    )
    out = text.decontaminated_train(docs, max_overlap=0.5).collect()
    assert out  # some docs land in train
    for r in out:
        assert 0.0 <= r["test_overlap_frac"] <= 1.0
        assert r["keep"] == (r["test_overlap_frac"] <= 0.5)


def test_corpus_card_single_row_summary(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "a b c", "s1"), (3, "d e", "s2")],
        "doc_id long, text string, source string",
    )
    out = text.corpus_card(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 3 and r["n_tokens"] == 8 and r["vocab_size"] == 5
    assert r["dup_rate"] == round(1 / 3, 6)  # docs 1 and 2 identical
    # source mix: 2/3 vs 1/3
    exp_ent = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert r["source_entropy"] == round(exp_ent, 6)


def test_bigram_pmi_detects_collocation(spark):
    import math

    # "new york" always adjacent; "the cat"/"the dog" mix freely
    docs = spark.createDataFrame(
        [(1, "new york " * 5), (2, "the cat the dog the cat the dog")],
        "doc_id long, text string",
    )
    out = {(r["tok_a"], r["tok_b"]): r for r in
           text.bigram_pmi(docs, min_count=2).collect()}
    assert ("new", "york") in out
    ny = out[("new", "york")]
    assert ny["n_pair"] == 5
    assert ny["pmi"] > 0  # genuine collocation scores positive


def test_mixture_rates_caps_and_redistributes(spark):
    # source a: 100 chars, b: 1000, c: 1000; budget 0.6 → per-source
    # target 420; a caps at 100 (rate 1), surplus 320 split evenly over
    # b and c → 580 each → rate 0.58
    rows = [("a", 100), ("b", 1000), ("c", 1000)]
    docs = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(rows)],
        "doc_id long, source string, n_chars long",
    )
    out = {r["source"]: r for r in text.mixture_rates(docs, budget_frac=0.6).collect()}
    assert out["a"]["capped"] and out["a"]["final_rate"] == 1.0
    assert out["b"]["final_rate"] == pytest.approx(0.58)
    assert out["c"]["final_rate"] == pytest.approx(0.58)
    assert out["a"]["expected"] == 100.0
    total_expected = sum(r["expected"] for r in out.values())
    assert total_expected == pytest.approx(0.6 * 2100)  # budget hit exactly


def test_blocklist_filter_counts(spark):
    docs = spark.createDataFrame(
        [(1, "slow query slow scan"), (2, "fast table"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           text.blocklist_filter(docs, blocklist=("slow",), max_share=0.4).collect()}
    assert out[1]["n_blocked"] == 2 and out[1]["n_tokens"] == 4
    assert out[1]["blocked_share"] == 0.5 and not out[1]["keep"]
    assert out[2]["n_blocked"] == 0 and out[2]["keep"]
    assert out[3]["n_tokens"] == 0 and out[3]["blocked_share"] == 0.0 and out[3]["keep"]


def test_sequence_packing_conserves_tokens(spark):
    import numpy as np

    rng = np.random.default_rng(13)
    rows = []
    for i in range(40):
        n = int(rng.integers(1, 30))
        rows.append((i, "en" if i % 2 else "fr", " ".join(["w"] * n)))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = text.sequence_packing(docs, max_len=16).collect()
    # conservation: every (truncated) token lands in exactly one example
    total_in = sum(min(len(t.split()), 16) for _, _, t in rows)
    assert sum(r["used_tokens"] for r in out) == total_in
    assert sum(r["n_docs"] for r in out) == 40
    for r in out:
        assert 0 <= r["pad_tokens"] <= 16
        assert 0 < r["efficiency"] <= 1.0 or r["used_tokens"] > 16


def test_mixture_rates_never_oversamples(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    rows = [(i, f"s{i % 7}", int(rng.integers(10, 5000))) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    for frac in (0.2, 0.5, 0.9):
        out = text.mixture_rates(docs, budget_frac=frac).collect()
        for r in out:
            assert 0.0 <= r["final_rate"] <= 1.0
            assert r["expected"] <= r["avail"] + 1e-6


def test_corpus_build_funnel_stage_consistency(spark):
    """The t42 flagship: stage boundaries chain (each stage's n_in ==
    the previous FILTER stage's n_out), the funnel is monotone through
    the filter stages, every survivor count equals the stage operator
    run standalone on the same survivors, and details carry the
    documented metrics."""
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    out = {r["stage"]: r for r in text.corpus_build_funnel(docs).collect()}
    assert set(out) == {
        "0_raw", "1_quality", "2_exact_dedup", "3_train_split",
        "4_decontam", "5_mixture", "6_packing",
    }
    n_raw = docs.count()
    assert out["0_raw"]["n_in"] == out["0_raw"]["n_out"] == n_raw
    chain = ["1_quality", "2_exact_dedup", "3_train_split", "4_decontam",
             "5_mixture"]
    prev = n_raw
    for st in chain:
        r = out[st]
        assert r["n_in"] == prev, st
        assert 0 <= r["n_out"] <= r["n_in"], st
        assert r["n_removed"] == r["n_in"] - r["n_out"], st
        prev = r["n_out"]
    # packing re-grains: its input is the mixture's output
    assert out["6_packing"]["n_in"] == out["5_mixture"]["n_out"]
    assert out["6_packing"]["n_removed"] == 0
    assert 0.0 < out["6_packing"]["detail"] <= 1.0  # pooled efficiency
    # stage-1 cross-check vs the standalone operator
    n_q = text.quality_filter(docs).where("keep").count()
    assert out["1_quality"]["n_out"] == n_q
    # stage-2 cross-check: distinct fingerprints among quality keepers
    from pyspark.sql import functions as F

    kept = docs.join(
        text.quality_filter(docs).where("keep").select("doc_id"), "doc_id"
    )
    n_fp = kept.select(text.fingerprint(F.col("text"))).distinct().count()
    assert out["2_exact_dedup"]["n_out"] == n_fp
    # mixture stage respects the per-source rates: a source with
    # final_rate 1.0 loses nothing
    assert out["5_mixture"]["n_out"] > 0


def test_corpus_build_funnel_crossmodal_stages(spark):
    """Round-14 verdict item 3: the cross-modal legs between exact
    dedup and the split.  Semantic stage: min-id keeper per embedding
    component survives, other members drop, survivors WITHOUT an
    embedding row pass through.  Image stage: same keeper rule over
    the dHash pair components of the remaining survivors.  Both
    receipt rows chain (n_in == previous n_out) and detail = the
    largest cluster."""
    import numpy as np
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    base = {r["stage"]: r for r in text.corpus_build_funnel(docs).collect()}
    s2_ids = sorted(
        r["doc_id"]
        for r in docs.join(
            text.quality_filter(docs).where("keep").select("doc_id"),
            "doc_id",
        )
        .withColumn("_fp", text.fingerprint(F.col("text")))
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    )
    # synthetic embeddings: the three smallest survivor ids share one
    # direction (one semantic cluster, keeper = min); everything else
    # orthogonal-ish random; one survivor gets NO embedding row
    rng = np.random.default_rng(5)
    no_emb = s2_ids[-1]
    cluster = s2_ids[:3]
    rows = []
    for i in s2_ids[:-1]:
        if i in cluster:
            v = np.array([1.0] * 8 + [0.0] * 56)
            v = v + rng.normal(0, 1e-3, 64)
        else:
            v = rng.normal(0, 1.0, 64)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # synthetic media: two survivors of the REMAINING set share an
    # identical payload (hd=0 image twins)
    out = {
        r["stage"]: r
        for r in text.corpus_build_funnel(
            docs, embeddings=emb, emb_threshold=0.8, media=docs.select(
                F.col("doc_id").alias("media_id"),
                F.encode(
                    F.when(
                        F.col("doc_id").isin(cluster[0], s2_ids[4]),
                        F.lit("shared payload bytes " * 16),
                    ).otherwise(F.concat(F.lit("uniq"), F.col("doc_id"),
                                         F.col("text"))),
                    "UTF-8",
                ).alias("payload"),
            ),
        ).collect()
    }
    n2 = base["2_exact_dedup"]["n_out"]
    r2a, r2b = out["2a_semantic_dedup"], out["2b_image_neardup"]
    assert r2a["n_in"] == n2
    # the semantic cluster keeps exactly its min id: 2 of 3 drop
    assert r2a["n_removed"] == 2 and r2a["detail"] >= 3.0
    assert r2b["n_in"] == r2a["n_out"]
    # the shared-payload pair: cluster[0] survived 2a (min id keeper),
    # s2_ids[4] was not in the semantic cluster — one of them drops
    assert r2b["n_removed"] == 1 and r2b["detail"] == 2.0
    assert out["3_train_split"]["n_in"] == r2b["n_out"]
    # the no-embedding survivor passed through the semantic stage: it
    # reaches the split input set (n2 - 2 - 1 docs)
    assert out["3_train_split"]["n_in"] == n2 - 3
