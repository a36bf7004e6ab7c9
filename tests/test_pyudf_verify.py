"""r16 optimization pins: the Arrow-batched exact-verify dot must be
BIT-IDENTICAL to the JVM ``aggregate(zip_with(...))`` fold, and the
sink-backed materialization mode must round-trip frames unchanged."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from projet_graphdb_spark.functions import similarity
from projet_graphdb_spark.functions.pyudf import seq_rowdot


def _fold_dot(va, vb):
    acc = 0.0
    for x, y in zip(va, vb):
        acc = acc + float(x) * float(y)
    return acc


def test_seq_rowdot_matches_fold():
    """np.cumsum must be a strict SEQUENTIAL accumulate on this numpy —
    the property the whole verify-tail optimization rests on.  A future
    numpy that vectorizes accumulate with SIMD partial sums would break
    bit-identity; this test fails loudly there."""
    rng = np.random.default_rng(7)
    for dim in (1, 2, 3, 16, 48, 257):
        A = rng.standard_normal((200, dim))
        B = rng.standard_normal((200, dim))
        A[::3] *= 1e8  # adversarial magnitudes: rounding order matters
        B[::5] *= 1e-8
        got = seq_rowdot(A, B)
        want = np.array([_fold_dot(a, b) for a, b in zip(A, B)])
        assert np.array_equal(got, want)  # bitwise, not allclose


def test_seq_rowdot_empty_vectors():
    assert list(seq_rowdot(np.empty((3, 0)), np.empty((3, 0)))) == [0.0] * 3


def test_seq_rowdot_float32_inputs_cast_first():
    """array<float> columns arrive as float32; the cast to f64 must
    happen BEFORE the product, like the JVM's per-element casts."""
    rng = np.random.default_rng(11)
    A32 = rng.standard_normal((50, 9)).astype(np.float32)
    B32 = rng.standard_normal((50, 9)).astype(np.float32)
    got = seq_rowdot(A32, B32)
    want = np.array(
        [_fold_dot(a.astype(np.float64), b.astype(np.float64))
         for a, b in zip(A32, B32)]
    )
    assert np.array_equal(got, want)


def test_pair_sim_bit_identical_to_jvm_fold(spark):
    """End-to-end: the ArrowEvalPython verify sim equals the JVM HOF
    sim BITWISE on a float32 embedding fixture (no tolerance)."""
    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.standard_normal(24).astype(np.float32)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, v array<float>")
    a = df.select(
        F.col("id").alias("id_a"), F.col("v").alias("_va"),
        similarity.l2norm(F.col("v")).alias("_na"),
    )
    b = df.select(
        F.col("id").alias("id_b"), F.col("v").alias("_vb"),
        similarity.l2norm(F.col("v")).alias("_nb"),
    )
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    jvm = pairs.withColumn(
        "sim",
        similarity.dot(F.col("_va"), F.col("_vb"))
        / (F.col("_na") * F.col("_nb")),
    ).select("id_a", "id_b", "sim")
    arrow = pairs.withColumn(
        "sim",
        similarity._pair_sim(
            F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
        ),
    ).select("id_a", "id_b", "sim")
    got = {(r.id_a, r.id_b): r.sim for r in arrow.collect()}
    want = {(r.id_a, r.id_b): r.sim for r in jvm.collect()}
    assert got == want  # dict equality on raw doubles == bitwise


def test_materialize_sink_backed_roundtrip(spark, tmp_path, monkeypatch):
    """SPARK_GRAFT_CKPT_DIR switches materialize() to a parquet
    round-trip: values unchanged, lineage cut (plan reads the sink),
    release() deletes the directory."""
    import os

    from projet_graphdb_spark.functions import materialize as M

    monkeypatch.setenv("SPARK_GRAFT_CKPT_DIR", str(tmp_path))
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    out = M.materialize(df)
    assert sorted(r.x for r in out.collect()) == sorted(
        r.x for r in df.collect()
    )
    h = M.handle_of(out)
    assert h is not None and os.path.isdir(h)
    assert "parquet" in out._jdf.queryExecution().executedPlan().toString().lower()
    M.release(h)
    assert not os.path.exists(h)


def test_materialize_default_is_local_checkpoint(spark, monkeypatch):
    from projet_graphdb_spark.functions import materialize as M

    monkeypatch.delenv("SPARK_GRAFT_CKPT_DIR", raising=False)
    out = M.materialize(spark.range(10))
    assert M.handle_of(out) is None
    assert out.count() == 10


def test_connected_components_sink_backed(spark, tmp_path, monkeypatch):
    """The iterative rotation works end-to-end in sink-backed mode and
    matches the default mode's labels."""
    from projet_graphdb_spark.functions.graph_algos import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 12), (3, 4)], "src long, dst long"
    )
    want = sorted(map(tuple, connected_components(edges).collect()))
    monkeypatch.setenv("SPARK_GRAFT_CKPT_DIR", str(tmp_path))
    got = sorted(map(tuple, connected_components(edges).collect()))
    assert got == want


def test_quality_filter_rejects_verdict_name_clash(spark):
    from projet_graphdb_spark.functions.text import quality_filter

    docs = spark.createDataFrame(
        [(1, "some text here", True)], "doc_id long, text string, keep boolean"
    )
    with pytest.raises(ValueError, match="keep"):
        quality_filter(docs, keep_input_cols=True)
    # without keep_input_cols the verdict projection drops input cols —
    # no ambiguity, no raise
    assert quality_filter(docs).columns[0] == "doc_id"


def test_shingle_frame_hash_fn_fold_matches_two_pass(spark):
    """shingle_frame(hash_fn=) must produce exactly the hashed arrays
    the old two-pass (shingle checkpoint, then transform) produced."""
    from projet_graphdb_spark.functions.dedup import (
        _hash_fn,
        shingle_frame,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z"), (3, ""), (4, "a b c d e f")],
        "doc_id long, text string",
    )
    for h in ("xxhash64", "md5"):
        fused = shingle_frame(docs, 3, "doc_id", "text", hash_fn=_hash_fn(h))
        two_pass = shingle_frame(docs, 3, "doc_id", "text").select(
            "doc_id",
            F.transform(F.col("_sh"), lambda s: _hash_fn(h)(s)).alias("_sh"),
        )
        got = {r.doc_id: sorted(r._sh) for r in fused.collect()}
        want = {r.doc_id: sorted(r._sh) for r in two_pass.collect()}
        assert got == want


def test_validate_lsh_index_config_hoisted(spark):
    """validate_lsh_index_config raises on mismatch; incremental call
    with validate_index=False skips the check (streaming hoists it)."""
    from projet_graphdb_spark.functions import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "b c d e f")], "doc_id long, text string"
    )
    idx = dedup.lsh_band_index(docs, hash="md5")
    dedup.validate_lsh_index_config(idx, 32, 8, 3, "md5")  # ok
    with pytest.raises(ValueError, match="built with"):
        dedup.validate_lsh_index_config(idx, 32, 8, 3, "xxhash64")


def test_srp_index_validate_flag(spark):
    """validate_index=False must skip the config job but produce the
    same pairs; validate_srp_index_config still rejects mismatches."""
    import numpy as np

    from projet_graphdb_spark.functions import similarity

    rng = np.random.default_rng(5)
    base = rng.standard_normal(8)
    rows = []
    for i in range(40):  # pairs of near-identical vectors → real dups
        v = base + rng.standard_normal(8) * (0.01 if i % 2 else 1.0)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    corpus = emb.where("vec_id < 30")
    shard = emb.where("vec_id >= 30")
    idx = similarity.srp_band_index(corpus, n_bands=4, bits=4, dim=8, seed=7)
    kw = dict(n_bands=4, bits=4, dim=8, seed=7, index=idx)
    want = sorted(map(tuple, similarity.incremental_srp_dups(
        corpus, shard, 0.8, **kw).collect()))
    got = sorted(map(tuple, similarity.incremental_srp_dups(
        corpus, shard, 0.8, validate_index=False, **kw).collect()))
    assert got == want
    with pytest.raises(ValueError, match="built with"):
        similarity.validate_srp_index_config(idx, 4, 4, 8, seed=99)


def test_hamming_validated_layout_passthrough(spark):
    """incremental_dhash_dups(validated_layout=(layout,)) must match
    the self-validating call exactly."""
    from projet_graphdb_spark.functions import multimodal
    from projet_graphdb_spark.functions.dedup import _validate_hamming_index

    corpus = spark.createDataFrame(
        [(2 * i, ("pix" * 40 + str(i)).encode()) for i in range(20)],
        "media_id long, payload binary",
    )
    shard = spark.createDataFrame(
        [(2 * i + 1, ("pix" * 40 + str(i)).encode()) for i in range(5)],
        "media_id long, payload binary",
    )
    idx = multimodal.dhash_band_index(corpus, bands=4)
    want = sorted(map(tuple, multimodal.incremental_dhash_dups(
        shard, idx, bands=4).collect()))
    layout = _validate_hamming_index(idx, 64, 4, "test")
    got = sorted(map(tuple, multimodal.incremental_dhash_dups(
        shard, idx, bands=4, validated_layout=(layout,)).collect()))
    assert got == want
