"""Round-4h operators: native recursive CTE (q58) and int8 embedding
quantization (s06).  Oracle parity is covered by test_oracle_parity
(both are registered with DuckDB oracles); these tests pin the
operator-level semantics and the zero-shuffle scale posture."""

from __future__ import annotations

import math

import numpy as np

from onechronos_etl_takehome_spark.operators.similarity import quantize_int8
from onechronos_etl_takehome_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _np_quantize(vec: list[float]) -> tuple[float, list[int]]:
    xd = np.array(vec, dtype=np.float32).astype(np.float64)
    scale = float(np.abs(xd).max()) if len(xd) else 0.0
    if scale == 0.0:
        return 0.0, [0] * len(xd)
    return scale, [int(math.floor(x * 127.0 / scale + 0.5)) for x in xd]


def test_quantize_int8_matches_model(spark):
    vecs = [
        (0, [0.5, -1.0, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0, codes all 0
        (2, [-3.5, 2.0, 1.0, -0.001]),
        (3, [1e-30, -1e-30, 0.0, 1e-38]),  # denormal-ish floats
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_int8(df, "vec_id", "embedding").collect()}
    for vid, vec in vecs:
        scale, codes = _np_quantize(vec)
        assert out[vid].q == codes, (vid, out[vid].q, codes)
        assert out[vid].scale == scale
        # symmetric int8 range is guaranteed by construction
        assert all(-127 <= c <= 127 for c in out[vid].q)


def test_quantize_int8_reconstruction_error_bounded(spark):
    # |x - q*scale/127| <= 0.5 * scale/127 (+ float32 cast is exact):
    # the defining property of symmetric round-to-nearest quantization.
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    rows = quantize_int8(emb, "vec_id", "embedding").join(
        emb, "vec_id"
    ).collect()
    assert rows
    for r in rows:
        if r.scale == 0.0:
            continue
        step = r.scale / 127.0
        for x, q in zip(r.embedding, r.q):
            assert abs(float(x) - q * step) <= 0.5 * step + 1e-12


def test_s06_plan_has_no_exchange(spark):
    # The quantization witness must fuse into the scan stage: any
    # Exchange means a higher-order expression fell out of codegen and
    # the "embarrassingly parallel at 100 TB" claim is void.
    df = QUERIES["s06_quantize_embeddings"](spark, SF)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Exchange" not in plan


def test_q58_min_hops_match_python_bfs(spark):
    # Rebuild the same thresholded edge set via DuckDB, BFS it in
    # python, and pin Spark's recursive-CTE min-hop output against the
    # model (walk counts are pinned by the DuckDB oracle in the parity
    # gate; min-hops are the graph semantics worth an independent model).
    import duckdb

    con = duckdb.connect()
    for t in ["lineitem", "supplier", "orders", "customer", "nation"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    edges = con.execute(
        """
        SELECT sn.n_name AS src, cn.n_name AS dst
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name <> cn.n_name
        GROUP BY sn.n_name, cn.n_name
        HAVING COUNT(*) * 1200 > (SELECT COUNT(*) FROM lineitem)
        """
    ).fetchall()
    con.close()
    adj: dict[str, list[str]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    src = min(adj)  # the query anchors at MIN(src)
    dist = {src: 0}
    frontier = [src]
    for hop in range(1, 4):  # the query bounds walks at hops < 3
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    got = {
        r.nation: r.min_hops
        for r in QUERIES["q58_recursive_reachability"](spark, SF).collect()
    }
    assert got == dist
    # non-vacuous witness: the BFS must actually reach other nations
    assert len(got) > 1 and max(got.values()) >= 1


def test_bpe_roundtrip_and_distributed_matches_local(spark):
    from onechronos_etl_takehome_spark.operators.bpe import (
        EOW,
        bpe_token_stats,
        encode,
        train_bpe,
    )

    corpus = [
        (0, "low low low low low lower lower"),
        (1, "newest newest newest newest widest widest"),
        (2, "the newest widget is the widest widget"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = train_bpe(df, "text", n_merges=50, sample_n=100)
    assert merges, "tiny corpus must produce at least one merge"
    ranks = {p: i for i, p in enumerate(merges)}

    # losslessness: tokens re-concatenate to the original word + EOW
    for w in ["low", "lower", "newest", "widest", "widget", "unseen"]:
        toks = encode(w, ranks)
        assert "".join(toks) == w + EOW
    # the most frequent word collapses to a single token
    assert encode("low", ranks) == ["low" + EOW]

    # the distributed Arrow path must equal the local encode, doc by doc
    out = {r.doc_id: r for r in bpe_token_stats(df, "doc_id", "text", merges).collect()}
    for doc_id, text in corpus:
        expect = (
            sum(len(encode(w, ranks)) for w in text.split(" ") if w)
            if isinstance(text, str)
            else 0
        )
        assert out[doc_id].n_bpe_tokens == expect, (doc_id, text)
    assert out[3].n_bpe_tokens == 0 and out[4].n_bpe_tokens == 0


def test_bpe_training_deterministic(spark):
    from onechronos_etl_takehome_spark.operators.bpe import train_bpe

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    m1 = train_bpe(docs, "text", n_merges=40, sample_n=300)
    m2 = train_bpe(docs, "text", n_merges=40, sample_n=300)
    assert m1 == m2 and len(m1) == 40


def test_t19_runs_and_counts_compress(spark):
    from onechronos_etl_takehome_spark.plans import QUERIES

    rows = QUERIES["t19_bpe_tokenize"](spark, SF).collect()
    assert rows
    # BPE merges only ever shrink the symbol stream: chars+EOW per word
    # is the unmerged ceiling.
    for r in rows:
        if r.n_words:
            assert 0 < r.n_bpe_tokens <= r.n_chars + r.n_words


def test_logreg_recovers_separable_rule(spark):
    from onechronos_etl_takehome_spark.operators.classifier import (
        featurize,
        score,
        train_logreg,
    )

    # label == 1 iff the doc is long: linearly separable in f_log_chars
    rows = []
    for i in range(60):
        short = "word " * 5
        long = "word " * 200
        rows.append((2 * i, short.strip(), 0))
        rows.append((2 * i + 1, long.strip(), 1))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    feats = featurize(df, "text")
    w, b = train_logreg(feats, "label", "doc_id", sample_n=200)
    out = score(feats, w, b).select("doc_id", "label", "predicted").collect()
    assert all(r.predicted == r.label for r in out)


def test_logreg_training_deterministic_and_scoring_matches_numpy(spark):
    import numpy as np

    from onechronos_etl_takehome_spark.operators.classifier import (
        FEATURE_COLS,
        featurize,
        score,
        train_logreg,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = featurize(docs, "text").withColumn(
        "label", (F.col("lang") == "en").cast("int")
    )
    w1, b1 = train_logreg(feats, "label", "doc_id", sample_n=300)
    w2, b2 = train_logreg(feats, "label", "doc_id", sample_n=300)
    assert w1 == w2 and b1 == b2

    rows = score(feats, w1, b1).select("doc_id", "score", *FEATURE_COLS).collect()
    X = np.array([[r[c] for c in FEATURE_COLS] for r in rows], dtype=np.float64)
    z = X @ np.array(w1) + b1
    expect = 1.0 / (1.0 + np.exp(-z))
    got = np.array([r.score for r in rows])
    assert np.allclose(got, expect, rtol=0, atol=1e-12)


def test_t20_runs_with_stable_schema(spark):
    rows = QUERIES["t20_quality_classifier"](spark, SF).collect()
    assert rows and set(rows[0].asDict()) == {"doc_id", "label", "predicted", "score"}
    # distilling the Gopher gate must genuinely beat majority-class
    # (measured ~0.90 vs ~0.51 at sf0.001; assert with slack)
    acc = sum(r.predicted == r.label for r in rows) / len(rows)
    base = max(sum(r.label for r in rows), sum(1 - r.label for r in rows)) / len(rows)
    assert acc >= base + 0.15


def test_cli_list_and_run(spark, capsys):
    from onechronos_etl_takehome_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary\toracled" in out
    assert "t19_bpe_tokenize\trows-only" in out

    rc = main(
        ["run", "q01_pricing_summary", "--sf-dir", SF, "--limit", "3", "--json"],
        spark=spark,
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 3

    assert main(["run", "nope"], spark=spark) == 2


def test_t20_scoring_is_streaming_compatible(spark, tmp_path):
    """Train offline, score online: featurize+score are stateless JVM
    projections, so the SAME code scores a readStream — the model-
    serving posture (no separate streaming twin needed)."""
    from pyspark.sql import functions as F

    from onechronos_etl_takehome_spark.operators.classifier import (
        featurize,
        score,
        train_logreg,
    )
    from onechronos_etl_takehome_spark.operators.quality import gopher_quality

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    labels = gopher_quality(docs, "doc_id", "text").select(
        "doc_id", F.col("passes_gopher").cast("int").alias("label")
    )
    feats = featurize(docs, "text").join(labels, "doc_id")
    w, b = train_logreg(feats, "label", "doc_id", sample_n=300)
    batch_scores = {
        r.doc_id: r.score for r in score(featurize(docs, "text"), w, b).collect()
    }

    # the file stream source wants a directory, not a single file
    src_dir = str(tmp_path / "docs_in")
    docs.write.parquet(src_dir)
    stream_in = spark.readStream.schema(docs.schema).parquet(src_dir)
    q = (
        score(featurize(stream_in, "text"), w, b)
        .select("doc_id", "score")
        .writeStream.format("memory")
        .queryName("t20_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r.score for r in spark.table("t20_stream").collect()}
    assert got == batch_scores
