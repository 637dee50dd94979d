"""Semantic contracts for the sharding/chunking/packing operators and the
skew diagnostic — properties the oracle-parity hash can't articulate on
its own (coverage invariants, histogram-vs-direct equivalence, boundary
merge semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_sm_spark.operators.scale import key_skew_diagnostics
from mapreduce_sm_spark.operators.sharding import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    N_SHARDS,
    chunk_documents_plan,
    doc_length_deciles,
    training_shard_manifest,
)
from tests.conftest import SF_DIR


def test_chunks_cover_every_token_exactly(spark):
    """Chunk spans tile each document: starts advance by the stride, the
    last chunk reaches the final token, no chunk is empty or overlong."""
    rows = chunk_documents_plan(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "no chunks produced"
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        n = chunks[0].n_tokens
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.start_tok == c.chunk_id * CHUNK_STRIDE
            assert 1 <= c.chunk_len <= CHUNK_TOKENS
            assert c.start_tok + c.chunk_len <= n
        # the final token is covered, and with one fewer chunk it wouldn't be
        last = chunks[-1]
        assert last.start_tok + last.chunk_len == n
        if len(chunks) > 1:
            prev = chunks[-2]
            # minimality: the second-to-last chunk cannot already reach the
            # end, so the last chunk is necessary...
            assert prev.start_tok + CHUNK_TOKENS < n
            # ...and consecutive chunks overlap (continuity, no gap)
            assert last.start_tok < prev.start_tok + prev.chunk_len


def test_shard_manifest_is_a_partition_of_the_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    man = training_shard_manifest(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in man) == n_docs
    assert all(0 <= r.shard_id < N_SHARDS for r in man)
    # deterministic: a second run produces the identical manifest
    again = training_shard_manifest(spark, SF_DIR).collect()
    assert sorted(map(tuple, man)) == sorted(map(tuple, again))


def test_deciles_histogram_plan_equals_direct_rank_plan(spark):
    """The histogram interval-math plan must equal the naive global
    row_number definition computed independently in Spark."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.size(F.split(F.col("text"), " ", -1)).alias("n_toks")
    )
    from pyspark.sql import Window

    w = Window.orderBy("n_toks", "doc_id")
    direct = (
        docs.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.lit(docs.count()))
        .withColumn("decile", F.expr("((rn - 1) * 10) DIV n + 1"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_toks").alias("min_tokens"),
            F.max("n_toks").alias("max_tokens"),
            F.sum("n_toks").alias("sum_tokens"),
        )
        .orderBy("decile")
        .collect()
    )
    hist = doc_length_deciles(spark, SF_DIR).collect()
    assert [tuple(r) for r in hist] == [tuple(r) for r in direct]
    assert sum(r.n_docs for r in hist) == sum(r.n_docs for r in direct)


def test_skew_diagnostics_on_handmade_skew(spark, tmp_path):
    """One key owning half the rows must surface as top_key with the right
    max/p99/ratio on a frame whose answer is computable by hand."""
    out = str(tmp_path / "skew_sf")
    # lineitem: key 7 has 50 rows; keys 100..149 have 1 row each
    li = spark.createDataFrame(
        [(7,)] * 50 + [(k,) for k in range(100, 150)], "l_orderkey long"
    )
    li.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    # events: uniform — 10 users x 4 rows
    ev = spark.createDataFrame(
        [(u,) for u in range(10) for _ in range(4)], "user_id long"
    )
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")
    rows = {r.keyed_table: r for r in key_skew_diagnostics(spark, out).collect()}
    li_r = rows["lineitem.l_orderkey"]
    assert (li_r.n_rows, li_r.n_keys, li_r.max_key_rows) == (100, 51, 50)
    assert li_r.top_key == 7
    # p99 rank over 51 keys = ceil(50.49) = 51 -> the hot key's count
    assert li_r.p99_key_rows == 50
    # max/mean = 50 / (100/51) = 25.5 -> 25500 in milli-units
    assert li_r.max_over_mean_x1000 == 50 * 51 * 1000 // 100
    ev_r = rows["events.user_id"]
    assert (ev_r.max_key_rows, ev_r.p99_key_rows, ev_r.max_over_mean_x1000) == (
        4,
        4,
        1000,
    )


def test_session_window_merges_touching_event(spark):
    """Pin the boundary semantics the streaming oracle depends on: an
    event at exactly prev + gap merges; one microsecond later splits."""
    from mapreduce_sm_spark.streaming.windows import streaming_session_micros

    base = 1_700_000_000_000_000  # epoch micros
    gap = 30 * 60 * 1_000_000
    df = spark.createDataFrame(
        [
            (1, base),
            (1, base + gap),  # touches: must merge
            (2, base),
            (2, base + gap + 1),  # 1 us past the gap: must split
        ],
        "user_id long, tsu long",
    ).select("user_id", F.timestamp_micros("tsu").alias("ts"))
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("s"),
            F.unix_micros("w.end").alias("e"),
            "n_events",
        )
        .collect()
    )
    sessions = sorted([(r.user_id, r.s, r.e, r.n_events) for r in out])
    assert sessions == [
        (1, base, base + 2 * gap, 2),
        (2, base, base + gap, 1),
        (2, base + gap + 1, base + 2 * gap + 1, 1),
    ]
    # and the streaming plan builder emits the same integer-micros shape
    cols = streaming_session_micros(
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ).parquet(SF_DIR)
    ).columns
    assert cols == ["user_id", "session_start_us", "session_end_us", "n_events"]
