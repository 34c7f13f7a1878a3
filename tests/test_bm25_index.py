"""Persisted BM25 inverted index (operators/retrieval.py r6): build
once / append forever / query many — the same index lifecycle as the
ANN and dedup indexes.  Global df/N/avgdl are derived at load time, so
appends are pure parquet appends."""

from pyspark.sql import functions as F

from fluss_datafusion_spark.operators import retrieval


def _docs(spark, testdata, lo, hi):
    return (
        spark.read.parquet(f"{testdata}/documents.parquet")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        .select("doc_id", "text")
    )


def _topk(spark, postings, doc_stats, corpus_stats, k=10):
    queries = spark.createDataFrame([(0, "hash join fast")], ["qid", "qtext"])
    return sorted(
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in retrieval.bm25_topk(
            postings, doc_stats, corpus_stats, queries, "qid", "qtext", k=k
        ).collect()
    )


def test_persisted_index_equals_inline_build(spark, testdata, tmp_path):
    docs = _docs(spark, testdata, 0, 400)
    retrieval.write_bm25_index(docs, "doc_id", "text", str(tmp_path / "idx"))
    inline = _topk(
        spark, *retrieval.build_bm25_index(docs, "doc_id", "text")
    )
    persisted = _topk(
        spark, *retrieval.load_bm25_index(spark, str(tmp_path / "idx"))
    )
    assert inline and inline == persisted


def test_append_equals_full_rebuild(spark, testdata, tmp_path):
    """Appending a second batch must give the EXACT ranking a full
    rebuild over the union gives — df/N/avgdl derived at load see every
    appended posting."""
    a = _docs(spark, testdata, 0, 250)
    b = _docs(spark, testdata, 250, 400)
    path = str(tmp_path / "idx2")
    retrieval.write_bm25_index(a, "doc_id", "text", path)
    retrieval.append_to_bm25_index(b, "doc_id", "text", path)
    appended = _topk(spark, *retrieval.load_bm25_index(spark, path))
    rebuilt = _topk(
        spark,
        *retrieval.build_bm25_index(a.unionByName(b), "doc_id", "text"),
    )
    assert appended and appended == rebuilt


def test_max_df_applies_at_load(spark, testdata, tmp_path):
    docs = _docs(spark, testdata, 0, 400)
    path = str(tmp_path / "idx3")
    retrieval.write_bm25_index(docs, "doc_id", "text", path)
    inline = _topk(
        spark, *retrieval.build_bm25_index(docs, "doc_id", "text", max_df=50)
    )
    persisted = _topk(
        spark, *retrieval.load_bm25_index(spark, path, max_df=50)
    )
    assert inline == persisted


def test_positional_postings_persist_and_append(spark, testdata, tmp_path):
    """Phrase/proximity queries serve from the persisted positions and
    appended documents join the match set."""
    a = _docs(spark, testdata, 0, 250)
    b = _docs(spark, testdata, 250, 400)
    path = str(tmp_path / "idx4")
    retrieval.write_bm25_index(a, "doc_id", "text", path, positional=True)
    retrieval.append_to_bm25_index(b, "doc_id", "text", path)
    both = a.unionByName(b)
    from_persisted = sorted(
        r.doc_id
        for r in retrieval.proximity_filter(
            both, "doc_id", "text", "hash join", slop=2,
            positional=retrieval.load_positional_postings(spark, path),
        ).collect()
    )
    derived = sorted(
        r.doc_id
        for r in retrieval.proximity_filter(
            both, "doc_id", "text", "hash join", slop=2
        ).collect()
    )
    assert from_persisted and from_persisted == derived


def test_bm25_ingest_sink_streams_documents_into_index(spark, testdata, tmp_path):
    """Streaming document ingest (r6): batches appended through the sink
    rank identically to a full rebuild over the union afterwards —
    df/N/avgdl derive at load, so streamed statistics are exact."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    seed = _docs(spark, testdata, 0, 250)
    new = _docs(spark, testdata, 250, 400)
    path = str(tmp_path / "bm25_streamed")
    retrieval.write_bm25_index(seed, "doc_id", "text", path, positional=True)

    replay = str(tmp_path / "doc_replay")
    os.makedirs(replay)
    rows = new.collect()
    base = time.time()
    for i, half in enumerate((rows[::2], rows[1::2])):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r["doc_id"] for r in half], pa.int64()),
                    "text": pa.array([r["text"] for r in half], pa.string()),
                }
            ),
            os.path.join(replay, f"b{i:05d}.parquet"),
        )
        os.utime(os.path.join(replay, f"b{i:05d}.parquet"), (base + i, base + i))

    stream = (
        spark.readStream.schema(spark.read.parquet(replay).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay)
    )
    metrics: list = []
    q = retrieval.bm25_ingest_sink(
        stream, path, str(tmp_path / "bm25_ckpt"), metrics=metrics
    )
    q.awaitTermination()
    assert sum(m["n_docs"] for m in metrics) == len(rows)

    streamed = _topk(spark, *retrieval.load_bm25_index(spark, path))
    rebuilt = _topk(
        spark,
        *retrieval.build_bm25_index(
            seed.unionByName(new), "doc_id", "text"
        ),
    )
    assert streamed and streamed == rebuilt
    # the positional leg followed the stream too
    both = seed.unionByName(new)
    from_persisted = sorted(
        r.doc_id
        for r in retrieval.proximity_filter(
            both, "doc_id", "text", "hash join", slop=1,
            positional=retrieval.load_positional_postings(spark, path),
        ).collect()
    )
    derived = sorted(
        r.doc_id
        for r in retrieval.proximity_filter(
            both, "doc_id", "text", "hash join", slop=1
        ).collect()
    )
    assert from_persisted == derived


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.sampled_from(["the", "hash", "join", "scan", "", "  ", "Fast"])
_texts = st.lists(_words, min_size=0, max_size=6).map(" ".join)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_texts, min_size=1, max_size=8))
def test_build_bm25_index_matches_reference_model(spark, texts):
    """r11 guard for the one-pass build refactor (dl from sum(tf), df
    as a term-partition window): random tiny corpora incl. empty /
    all-whitespace / case-folded docs must produce exactly the postings,
    doc lengths, and corpus stats a brute-force python model derives."""
    from collections import Counter

    from fluss_datafusion_spark.operators.retrieval import build_bm25_index

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    postings, doc_stats, corpus_stats = build_bm25_index(
        docs, "doc_id", "text"
    )

    # reference model: whitespace tokens, lowercased, empties dropped
    tf = Counter()
    dl = Counter()
    for i, t in enumerate(texts):
        for tok in t.lower().split():
            tf[(tok, i)] += 1
            dl[i] += 1
    df_t = Counter(term for term, _ in tf)

    got_postings = {
        (r["__term__"], r["__doc__"]): (r["__tf__"], r["__df__"])
        for r in postings.collect()
    }
    assert got_postings == {
        (term, doc): (n, df_t[term]) for (term, doc), n in tf.items()
    }, texts
    got_dl = {r["__doc__"]: r["__dl__"] for r in doc_stats.collect()}
    assert got_dl == dict(dl), texts
    n_row = corpus_stats.collect()[0]
    assert n_row["__N__"] == len(dl)
    if dl:
        expected_avg = sum(dl.values()) / len(dl)
        assert abs(n_row["__avgdl__"] - expected_avg) < 1e-9
    else:
        assert n_row["__avgdl__"] is None
