"""Structured Streaming twins: file source -> windowed aggs -> memory
sink, verified against the batch operators on the same data."""

import datetime as dt
import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from clinpy_spark.operators.windows import tumbling_counts
from clinpy_spark.streaming.events import (
    read_event_stream,
    streaming_session_counts,
    streaming_tumbling_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
ROWS = [
    (1, T0, 100, "click", 1.0),
    (2, T0 + dt.timedelta(minutes=20), 100, "click", 2.0),
    (3, T0 + dt.timedelta(minutes=90), 100, "view", 3.0),
    (4, T0 + dt.timedelta(minutes=5), 200, "click", 4.0),
]


def _write_events(path):
    with open(path / "part-0.json", "w") as fh:
        for eid, ts, uid, etype, val in ROWS:
            fh.write(json.dumps({
                "event_id": eid, "ts": ts.isoformat(), "user_id": uid,
                "event_type": etype, "value": val, "props": "{}",
            }) + "\n")


def _run_stream(spark, df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def _drain_stateful(spark, q, table, want_rows, timeout=120):
    """Poll-and-stop for applyInPandasWithState queries with a
    processing-time TTL: the pending timer keeps availableNow
    scheduling empty micro-batches forever, so awaitTermination(N)
    always burns its FULL timeout (r11 finding - every TTL-stateful
    test silently cost 120s). Poll the memory sink until the expected
    row count lands, then stop the query explicitly."""
    import time as _time

    deadline = _time.time() + timeout
    n = -1
    while _time.time() < deadline:
        n = spark.sql(f"select count(*) from {table}").collect()[0][0]
        if n >= want_rows:
            break
        _time.sleep(0.5)
    q.stop()
    return n


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    _write_events(tmp_path)
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    out = _run_stream(
        spark, streaming_tumbling_counts(stream, "1 hour", keys=["event_type"]), "tumb"
    ).collect()
    got = {(r.ws, r.event_type): (r.n, r.sum_value) for r in out}

    batch = spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    expect = {(r.ws, r.event_type): (r.n, r.sum_value)
              for r in tumbling_counts(batch, keys=["event_type"]).collect()}
    # batch tumbling rounds sum_value; compare modulo rounding
    assert set(got) == set(expect)
    assert got[(T0, "click")] == (3, 7.0)


def test_streaming_sessions(spark, tmp_path):
    _write_events(tmp_path)
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    out = _run_stream(spark, streaming_session_counts(stream, gap="30 minutes"), "sess").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[100]) == [1, 2]  # events 1+2 merge, 3 alone
    assert per_user[200] == [1]


def test_streaming_ewma_stateful(spark, tmp_path):
    from clinpy_spark.streaming.events import streaming_ewma

    _write_events(tmp_path)
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = (streaming_ewma(stream, alpha=0.5).writeStream.format("memory")
         .queryName("ewma").outputMode("update").trigger(availableNow=True).start())
    _drain_stateful(spark, q, "ewma", 2)
    out = {r.user_id: (r.ewma, r.n_events) for r in spark.sql("select * from ewma").collect()}
    # user 100 values in ts order: 1.0, 2.0, 3.0 ->
    # e1=1.0, e2=0.5*2+0.5*1=1.5, e3=0.5*3+0.5*1.5=2.25
    assert out[100] == (2.25, 3)
    assert out[200] == (4.0, 1)


def test_streaming_first_seen_dedup(spark, tmp_path):
    from clinpy_spark.streaming.events import streaming_first_seen

    # Two keys, key "a" appears twice (events 1 and 2) -> emitted once.
    with open(tmp_path / "part-0.json", "w") as fh:
        for eid, key in [(1, "a"), (2, "a"), (3, "b")]:
            fh.write(json.dumps({
                "event_id": eid, "ts": T0.isoformat(), "user_id": 1,
                "event_type": "click", "value": 0.0, "props": key,
            }) + "\n")
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = (streaming_first_seen(stream, key_col="props").writeStream.format("memory")
         .queryName("firstseen").outputMode("update").trigger(availableNow=True).start())
    _drain_stateful(spark, q, "firstseen", 2)
    out = {r.props: r.first_event_id for r in spark.sql("select * from firstseen").collect()}
    assert out == {"a": 1, "b": 3}


def test_streaming_curation_twin(spark, tmp_path):
    """Streaming curation: same gate exprs as the batch operator, with
    dropDuplicatesWithinWatermark as the stateful first-seen dup gate."""
    import json as _json

    from clinpy_spark.functions.text import fingerprint
    from clinpy_spark.streaming.curate import streaming_curate, streaming_curation_stats

    docs = [
        (1, T0, "en", "alpha beta gamma"),
        (2, T0 + dt.timedelta(minutes=1), "en", "alpha beta gamma"),   # dup of 1
        (3, T0 + dt.timedelta(minutes=2), "fr", "bonjour le monde"),   # lang gate
        (4, T0 + dt.timedelta(minutes=3), "en", "x"),                  # short gate
        (5, T0 + dt.timedelta(minutes=4), "en", "delta epsilon zeta"),
    ]
    src = tmp_path / "docs"
    src.mkdir()
    with open(src / "part-0.json", "w") as fh:
        for did, ts, lang, text in docs:
            fh.write(_json.dumps(
                {"doc_id": did, "ts": ts.isoformat(), "lang": lang, "text": text}) + "\n")

    schema = "doc_id long, ts timestamp, lang string, text string"
    stream = spark.readStream.format("json").schema(schema).load(str(src))
    gates = [
        ("lang", ~F.col("lang").isin("en")),
        ("short", F.size(F.split("text", " ")) < 2),
    ]

    kept = streaming_curate(stream, gates, dedup_on=fingerprint("text"))
    q = (kept.writeStream.format("memory").queryName("cur_kept")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    ids = {r.doc_id for r in spark.sql("select * from cur_kept").collect()}
    assert ids == {1, 5}  # first-seen dedup dropped 2; gates dropped 3, 4
    cols = spark.sql("select * from cur_kept").columns
    assert "__fp" not in cols and "gate" not in cols

    stats = _run_stream(
        spark, streaming_curation_stats(stream, gates), "cur_stats"
    ).collect()
    assert {r.gate: r.n for r in stats} == {"kept": 3, "lang": 1, "short": 1}


def test_stream_to_catalog_exactly_once(spark, tmp_path):
    """Parquet sink + checkpoint: drained rows land in the catalog table;
    re-running from the same checkpoint adds NOTHING (exactly-once);
    new source files add only their own rows."""
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.curate import streaming_curate  # noqa: F401 (import path sanity)
    from clinpy_spark.streaming.events import read_event_stream
    from clinpy_spark.streaming.sink import stream_to_catalog

    src = tmp_path / "src"
    src.mkdir()
    _write_events(src)
    catalog = ProjectCatalog(spark, str(tmp_path / "proj"))
    os.makedirs(catalog.project_dir, exist_ok=True)

    def drain():
        q = stream_to_catalog(
            read_event_stream(spark, str(src), fmt="json"), catalog, "events_sink"
        )
        q.awaitTermination(120)

    drain()
    assert catalog.table("events_sink").count() == len(ROWS)
    drain()  # same checkpoint, same source: no duplicates
    assert catalog.table("events_sink").count() == len(ROWS)

    with open(src / "part-1.json", "w") as fh:
        fh.write('{"event_id": 99, "ts": "2024-01-02T00:00:00", "user_id": 300, '
                 '"event_type": "click", "value": 9.0, "props": "{}"}\n')
    drain()
    assert catalog.table("events_sink").count() == len(ROWS) + 1

    # Batch readers of a streamed table trust only the _spark_metadata
    # manifest, so a batch append would write rows the reader silently
    # never sees — the catalog must refuse the mixed-path append.
    import pytest

    with pytest.raises(ValueError, match="_spark_metadata"):
        catalog.write(catalog.table("events_sink").limit(1), "events_sink", mode="append")


def test_streaming_correlate_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream join: clicks pair with views of the
    same user within the time bound; state stays finite by watermark."""
    from clinpy_spark.streaming.events import read_event_stream, streaming_correlate

    _write_events(tmp_path)
    clicks = read_event_stream(spark, str(tmp_path), fmt="json").filter(
        F.col("event_type") == "click")
    views = read_event_stream(spark, str(tmp_path), fmt="json").filter(
        F.col("event_type") == "view")
    out = streaming_correlate(clicks, views, within="2 hours")
    q = (out.writeStream.format("memory").queryName("corr")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.left_id, r.right_id) for r in spark.sql("select * from corr").collect()}
    # user 100: clicks 1 (t0) + 2 (t0+20m) both within 2h of view 3 (t0+90m);
    # user 200's click has no view.
    assert got == {(1, 3), (2, 3)}


def test_streaming_passage_dedup_matches_batch(spark, tmp_path):
    """Streaming passage dedup: per-chunk first-seen state carries ACROSS
    micro-batches (maxFilesPerTrigger=1 forces one batch per file), and
    reassembling the decisions reproduces the batch operator exactly on
    the same corpus — arrival order matches the batch (id, pos) order,
    so first-arrival == min-(id, pos)."""
    import json as _json

    from clinpy_spark.operators.dedup import passage_dedup, reassemble_passages
    from clinpy_spark.streaming.curate import streaming_passage_dedup

    boiler = "a b c"
    docs = [
        (1, boiler + " x y z"),   # batch 1: chunks "a b c", "x y z"
        (2, boiler + " p q r"),   # batch 2: "a b c" repeats across batches
        (3, "x y z u v w"),       # batch 3: "x y z" repeats; "u v w" new
    ]
    src = tmp_path / "docs"
    src.mkdir()
    for did, text in docs:
        p = src / f"part-{did}.json"
        with open(p, "w") as fh:
            fh.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        # FileStreamSource orders batches by modification time; equal
        # mtimes make arrival order nondeterministic — pin it.
        os.utime(p, (1_700_000_000 + did, 1_700_000_000 + did))

    stream = (
        spark.readStream.format("json").schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).load(str(src))
    )
    flagged = streaming_passage_dedup(stream, chunk_words=3)
    q = (flagged.writeStream.format("memory").queryName("pdedup")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    decisions = spark.sql("select * from pdedup")
    assert decisions.count() == 6  # every chunk got exactly one decision row

    got = {r.doc_id: (r.n_chunks, r.n_kept, r.clean_text)
           for r in reassemble_passages(decisions).collect()}
    bdf = spark.createDataFrame(docs, "doc_id long, text string")
    want = {r.doc_id: (r.n_chunks, r.n_kept, r.clean_text)
            for r in passage_dedup(bdf, chunk_words=3).collect()}
    assert got == want
    assert got[2] == (2, 1, "p q r")          # cross-batch drop of "a b c"
    assert got[3] == (2, 1, "u v w")          # cross-batch drop of "x y z"


def test_stream_stats_incremental_fold(spark, tmp_path):
    """Streaming incremental stats: three files arriving as separate
    micro-batches fold into the persisted partials; the finalized view
    equals the batch recompute over everything that arrived."""
    import json as _json

    import pytest

    from clinpy_spark.operators.incremental import finalize, partial_aggregate
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.sink import stream_stats_to_catalog

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [("en", 10.0), ("fr", 1.0)],
        [("en", 40.0), ("de", 7.0)],
        [("fr", 2.0), ("en", 4.0)],
    ]
    rows = []
    for i, b in enumerate(batches):
        p = src / f"part-{i}.json"
        with open(p, "w") as fh:
            for lang, score in b:
                fh.write(_json.dumps({"lang": lang, "score": score}) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        rows += b

    catalog = ProjectCatalog(spark, str(tmp_path / "proj"))
    os.makedirs(catalog.project_dir, exist_ok=True)
    stream = (
        spark.readStream.format("json").schema("lang string, score double")
        .option("maxFilesPerTrigger", 1).load(str(src))
    )
    q = stream_stats_to_catalog(stream, catalog, "lang_stats", ["lang"], ["score"])
    q.awaitTermination(120)

    got = {r.lang: (r.n, r.score_mean) for r in
           finalize(catalog.table("lang_stats"), ["score"]).collect()}
    full = {r.lang: (r.n, r.score_mean) for r in
            finalize(partial_aggregate(
                spark.createDataFrame(rows, "lang string, score double"),
                ["lang"], ["score"]), ["score"]).collect()}
    assert got == full
    assert got["en"] == (3, pytest.approx(18.0))


def test_streaming_media_decode_twin(spark, tmp_path):
    """The multimodal decode path runs unchanged inside Structured
    Streaming: parquet-source media stream -> mapInPandas codecs
    (extract_features) -> memory sink, equal to the batch decode of the
    same payloads. Pins that the codec operators stay stream-safe (no
    driver materialization, no batch-only APIs in the hot path)."""
    import numpy as np

    from clinpy_spark.operators.multimodal import (
        MEDIA_FEATURE_SCHEMA, as_media, encode_bmp, extract_features,
    )
    from clinpy_spark.operators.jpeg import encode_jpeg

    media_dir = tmp_path / "media"
    rows = [
        (1, "image", bytearray(encode_bmp(np.full((4, 6, 3), 50, np.uint8)))),
        (2, "image", bytearray(encode_jpeg(np.full((8, 9, 3), 120, np.uint8)))),
        (3, "image", bytearray(b"P6\n3 2\n255\n" + bytes([200] * 18))),
    ]
    batch_df = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary")
    batch_df.write.parquet(str(media_dir))

    stream = spark.readStream.schema(batch_df.schema).parquet(str(media_dir))
    out = (
        extract_features(stream.select("media_id", "media_type", "payload"))
        .writeStream.format("memory").queryName("media_feats")
        .outputMode("append").trigger(availableNow=True).start()
    )
    out.awaitTermination(120)
    got = {r.media_id: (r.width, r.height, round(r.mean_intensity, 6))
           for r in spark.sql("select * from media_feats").collect()}
    expect = {r.media_id: (r.width, r.height, round(r.mean_intensity, 6))
              for r in extract_features(batch_df).collect()}
    assert got == expect
    assert got[1] == (6, 4, round(50 / 255, 6)) and got[2] == (9, 8, round(120 / 255, 6))


def test_streaming_bpe_encode_twin(spark, tmp_path):
    """bpe_encode (mapInPandas with a closure-shipped merge table) is
    stream-transparent: encoding a file stream batch-by-batch yields the
    exact rows the batch operator produces — the tokenize-on-ingest shape
    of a training-data pipeline (train offline, segment the stream)."""
    from clinpy_spark.operators.bpe import bpe_encode, bpe_train

    docs = [(1, "stream the stream"), (2, "the theme"), (3, "fresh stream data")]
    batch = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_train(batch, num_merges=12, max_word_types=100)

    src = tmp_path / "bpe_docs"
    src.mkdir()
    for did, text in docs:  # one file per doc -> multiple micro-batches
        with open(src / f"part-{did}.json", "w") as fh:
            fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")
    stream = (spark.readStream.format("json")
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).load(str(src)))

    enc = bpe_encode(stream, merges)
    q = (enc.writeStream.format("memory").queryName("bpe_enc")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.sql("select * from bpe_enc").collect()}
    want = {tuple(r) for r in bpe_encode(batch, merges).collect()}
    assert got == want and len(got) == 3


def test_streaming_cms_twin(spark, tmp_path):
    """count_min is a pure groupBy-count, so its streaming twin (complete
    output mode over a file stream) converges to the batch sketch —
    sketch maintenance works on a live stream with no operator changes."""
    docs = [(1, "a b a"), (2, "b c"), (3, "a d d")]
    src = tmp_path / "cms_docs"
    src.mkdir()
    for did, text in docs:
        with open(src / f"p{did}.json", "w") as fh:
            fh.write(json.dumps({"doc_id": did, "text": text}) + "\n")

    from clinpy_spark.functions.text import norm_tokens
    from clinpy_spark.operators.sketch import count_min

    stream = (spark.readStream.format("json")
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).load(str(src)))
    tok_s = stream.select(F.explode(norm_tokens("text")).alias("t"))
    q = (count_min(tok_s, width=16, depth=3)
         .writeStream.format("memory").queryName("cms_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = spark.createDataFrame(docs, "doc_id long, text string")
    tok_b = batch.select(F.explode(norm_tokens("text")).alias("t"))
    want = {(r.row, r.bucket): r.cnt for r in count_min(tok_b, width=16, depth=3).collect()}
    got = {(r.row, r.bucket): r.cnt
           for r in spark.sql("select * from cms_stream").collect()}
    assert got == want


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """CEP funnel state machine: ordered replay matches the batch
    funnel exactly; advances across micro-batches carry state; a
    step-2 event arriving before step 1 does not count."""
    from clinpy_spark.operators.funnel import funnel
    from clinpy_spark.streaming.events import streaming_funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 completes across two files (cross-batch state)
        (1, t(0), 1, "view", 0.0), (2, t(5), 1, "click", 0.0),
        (3, t(9), 1, "purchase", 0.0),
        # u2 clicks before viewing -> stuck at step 1
        (4, t(3), 2, "click", 0.0), (5, t(4), 2, "view", 0.0),
        # u3 view only
        (6, t(1), 3, "view", 0.0),
    ]
    for i, batch in enumerate((rows[:2] + rows[3:], rows[2:3])):
        with open(tmp_path / f"f{i}.json", "w") as fh:
            for eid, ts, uid, etype, val in batch:
                fh.write(json.dumps({
                    "event_id": eid, "ts": ts.isoformat(), "user_id": uid,
                    "event_type": etype, "value": val, "props": "{}",
                }) + "\n")

    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = (streaming_funnel(stream, ["view", "click", "purchase"], state_ttl_ms=10_000_000)
         .writeStream.format("memory").queryName("funl")
         .outputMode("update").trigger(availableNow=True).start())
    _drain_stateful(spark, q, "funl", 4)
    out = {}
    for r in spark.sql("select * from funl").collect():
        # keep the furthest emission per user across micro-batches
        if r.user_id not in out or r.furthest_step > out[r.user_id]:
            out[r.user_id] = r.furthest_step
    assert out == {1: 3, 2: 1, 3: 1}

    batch_df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double")
    per = {r.user_id: sum(1 for i in (1, 2, 3) if r[f"step_{i}_ts"] is not None)
           for r in funnel(batch_df, ["view", "click", "purchase"]).collect()}
    assert per == out


def test_streaming_check_suite_matches_batch(spark, tmp_path):
    """Constraint-suite streaming twin: additive partials folded per
    micro-batch equal the batch suite over the full data; non-additive
    checks are refused."""
    import pytest as _pytest

    from clinpy_spark.operators.quality import check_suite
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.quality import (
        check_partials, finalize_checks, stream_check_suite,
    )

    checks = [
        {"name": "val_complete", "check": "completeness", "col": "value",
         "min_frac": 0.9},
        {"name": "val_range", "check": "range", "col": "value", "lo": 0.0, "hi": 3.5},
        {"name": "type_pat", "check": "pattern", "col": "event_type",
         "regex": "^[a-z]+$", "min_frac": 1.0},
    ]
    with _pytest.raises(ValueError):
        check_partials(spark.range(1), [{"name": "u", "check": "uniqueness", "col": "id"}])

    _write_events(tmp_path / "in" if (tmp_path / "in").mkdir() is None else tmp_path)
    src = tmp_path / "in"
    stream = read_event_stream(spark, str(src), fmt="json")
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    q = stream_check_suite(stream, cat, "checks", checks,
                           checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {r.check_name: (r.metric, r.passed)
           for r in finalize_checks(cat.table("checks"), checks).collect()}
    batch = spark.createDataFrame(
        ROWS, "event_id long, ts timestamp, user_id long, event_type string, value double")
    exp = {r.check_name: (r.metric, r.passed)
           for r in check_suite(batch, checks).collect()}
    assert got == exp
    assert got["val_range"] == (1.0, False)  # value 4.0 violates hi=3.5


def test_streaming_transitions_match_batch(spark, tmp_path):
    """Cross-batch Markov deltas: the boundary pair (last event of
    batch 1 -> first event of batch 2) is counted exactly once, and
    summed deltas equal the batch lead-window counts."""
    from clinpy_spark.streaming.events import streaming_transitions

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(0), 1, "view", 0.0), (2, t(1), 1, "click", 0.0),
        (3, t(2), 1, "view", 0.0),   # batch 1 ends: last = view
        (4, t(3), 1, "click", 0.0),  # boundary pair view->click
        (5, t(4), 1, "purchase", 0.0),
        (6, t(0), 2, "view", 0.0),   # single event, no transition
    ]
    for i, batch in enumerate((rows[:3] + rows[5:], rows[3:5])):
        with open(tmp_path / f"f{i}.json", "w") as fh:
            for eid, ts, uid, etype, val in batch:
                fh.write(json.dumps({
                    "event_id": eid, "ts": ts.isoformat(), "user_id": uid,
                    "event_type": etype, "value": val, "props": "{}",
                }) + "\n")
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = (streaming_transitions(stream, state_ttl_ms=10_000_000)
         .writeStream.format("memory").queryName("trans")
         .outputMode("update").trigger(availableNow=True).start())
    _drain_stateful(spark, q, "trans", 4)
    got = {}
    for r in spark.sql("select * from trans").collect():
        got[(r.event_type, r.next_type)] = got.get((r.event_type, r.next_type), 0) + r.n
    assert got == {("view", "click"): 2, ("click", "view"): 1,
                   ("click", "purchase"): 1}


def test_streaming_funnel_group_split_across_arrow_chunks(spark, tmp_path):
    """Regression (r9 advice): a group's rows reach the state function
    split across Arrow record batches with NO cross-chunk ordering
    guarantee, so sorting each chunk independently mis-orders large
    groups. Force 2-row chunks and a file order where the click
    precedes the view: per-chunk sorting consumes the click before the
    view and strands the funnel at step 1; the whole-group sort must
    still reach step 3."""
    from clinpy_spark.operators.funnel import funnel
    from clinpy_spark.streaming.events import streaming_funnel

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    # file order: click first, fillers, then view, then purchase
    rows = [(1, t(60), 1, "click", 0.0)]
    rows += [(10 + i, t(i), 1, "noise", 0.0) for i in range(4)]
    rows += [(2, t(50), 1, "view", 0.0)]
    rows += [(20 + i, t(i + 5), 1, "noise", 0.0) for i in range(4)]
    rows += [(3, t(70), 1, "purchase", 0.0)]
    with open(tmp_path / "f0.json", "w") as fh:
        for eid, ts, uid, etype, val in rows:
            fh.write(json.dumps({
                "event_id": eid, "ts": ts.isoformat(), "user_id": uid,
                "event_type": etype, "value": val, "props": "{}",
            }) + "\n")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = read_event_stream(spark, str(tmp_path), fmt="json")
        q = (streaming_funnel(stream, ["view", "click", "purchase"],
                              state_ttl_ms=10_000_000)
             .writeStream.format("memory").queryName("funl_chunk")
             .outputMode("update").trigger(availableNow=True).start())
        _drain_stateful(spark, q, "funl_chunk", 1)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = max(r.furthest_step for r in spark.sql("select * from funl_chunk").collect())
    batch_df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double")
    want = max(
        sum(1 for i in (1, 2, 3) if r[f"step_{i}_ts"] is not None)
        for r in funnel(batch_df, ["view", "click", "purchase"]).collect())
    assert got == want == 3


def test_streaming_transitions_group_split_across_arrow_chunks(spark, tmp_path):
    """Same chunk-ordering regression for the Markov-delta twin: with
    2-row Arrow chunks and a scrambled file order, per-chunk sorting
    would count phantom pairs; the whole-group sort must reproduce the
    batch lead-window counts exactly."""
    from clinpy_spark.streaming.events import streaming_transitions

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    # event-time order is a,b,c,d,e; file order scrambles it
    seq = [("a", 0), ("b", 1), ("c", 2), ("d", 3), ("e", 4)]
    file_order = [seq[4], seq[2], seq[0], seq[3], seq[1]]
    with open(tmp_path / "f0.json", "w") as fh:
        for i, (etype, m) in enumerate(file_order):
            fh.write(json.dumps({
                "event_id": i, "ts": t(m).isoformat(), "user_id": 1,
                "event_type": etype, "value": 0.0, "props": "{}",
            }) + "\n")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = read_event_stream(spark, str(tmp_path), fmt="json")
        q = (streaming_transitions(stream, state_ttl_ms=10_000_000)
             .writeStream.format("memory").queryName("trans_chunk")
             .outputMode("update").trigger(availableNow=True).start())
        _drain_stateful(spark, q, "trans_chunk", 4)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {}
    for r in spark.sql("select * from trans_chunk").collect():
        got[(r.event_type, r.next_type)] = got.get((r.event_type, r.next_type), 0) + r.n
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1, ("d", "e"): 1}


def test_streaming_funnel_string_user_ids(spark, tmp_path):
    """Regression (r9 advice): the funnel's output schema hardcoded the
    user column as long; a string user id must pass through."""
    from pyspark.sql import types as T

    from clinpy_spark.streaming.events import streaming_funnel

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
    ])
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    with open(tmp_path / "f0.json", "w") as fh:
        for m, etype in ((0, "view"), (1, "click")):
            fh.write(json.dumps({
                "ts": t(m).isoformat(), "user_id": "alice", "event_type": etype,
            }) + "\n")
    stream = spark.readStream.schema(schema).json(str(tmp_path))
    q = (streaming_funnel(stream, ["view", "click"], state_ttl_ms=10_000_000)
         .writeStream.format("memory").queryName("funl_str")
         .outputMode("update").trigger(availableNow=True).start())
    _drain_stateful(spark, q, "funl_str", 1)
    rows = spark.sql("select * from funl_str").collect()
    assert rows and rows[0].user_id == "alice"
    assert max(r.furthest_step for r in rows) == 2


def test_streaming_psi_matches_batch(spark, tmp_path):
    """Streaming PSI twin: per-bin count partials folded across
    micro-batches with FROZEN reference edges reproduce the batch
    psi_table exactly (cross-batch accumulation exercised by splitting
    the events across two files)."""
    from clinpy_spark.operators.drift import psi_table, quantile_edges
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.drift import (
        bin_counts_partial, finalize_psi, stream_psi_counts,
    )

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    rows = [(i, t(i), 100 + i % 2, "view", float((i * 37) % 50)) for i in range(60)]
    ref_rows = [r for r in rows if r[2] % 2 == 0]
    cur_rows = [r for r in rows if r[2] % 2 == 1]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    ref_df = spark.createDataFrame(ref_rows, schema)
    cur_df = spark.createDataFrame(cur_rows, schema)

    n_bins = 5
    edges = quantile_edges(ref_df, "value", n_bins).collect()[0]["__edges"]

    # stream the CURRENT cohort in two files; maintain ref counts in batch
    for i, chunk in enumerate((cur_rows[:10], cur_rows[10:])):
        with open(tmp_path / f"f{i}.json", "w") as fh:
            for eid, ts, uid, etype, val in chunk:
                fh.write(json.dumps({
                    "event_id": eid, "ts": ts.isoformat(), "user_id": uid,
                    "event_type": etype, "value": val, "props": "{}",
                }) + "\n")
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = stream_psi_counts(stream, cat, "cur_bins", "value", list(edges),
                          checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)

    ref_counts = bin_counts_partial(ref_df, "value", list(edges))
    got = finalize_psi(ref_counts, cat.table("cur_bins"), n_bins).collect()
    want = psi_table(ref_df, cur_df, "value", n_bins=n_bins).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_streaming_km_matches_batch(spark, tmp_path):
    """Streaming KM twin: per-(group, time) event/censor partials
    folded across two micro-batches reproduce the batch km_curve over
    the union exactly (cross-batch accumulation on shared times
    exercised: both batches contribute at t=2)."""
    from clinpy_spark.operators.survival import km_curve
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.survival import km_read, stream_km_partials

    b1 = [("a", 1, 1), ("a", 2, 1), ("a", 3, 0), ("b", 2, 1)]
    b2 = [("a", 2, 1), ("a", 5, 0), ("b", 2, 0), ("b", 4, 1)]
    src = tmp_path / "cohort"
    src.mkdir()
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    stream = (
        spark.readStream.schema("grp string, t long, evt int")
        .option("maxFilesPerTrigger", 1).json(str(src))
    )
    import json as _json
    for i, rows in enumerate((b1, b2)):
        with open(src / f"part-{i}.json", "w") as fh:
            for g, t, e in rows:
                fh.write(_json.dumps({"grp": g, "t": t, "evt": e}) + "\n")
    q = stream_km_partials(
        stream, cat, "km_grid", "t", "evt", "grp",
        checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {(r.grp, r.t): (r.n_risk, r.n_events, r.n_censored, r.survival)
           for r in km_read(cat.table("km_grid"), "t", "grp").collect()}
    batch = spark.createDataFrame(b1 + b2, "grp string, t long, evt int")
    exp = {(r.grp, r.t): (r.n_risk, r.n_events, r.n_censored, r.survival)
           for r in km_curve(batch, "t", "evt", "grp").collect()}
    assert got == exp
    assert got[("a", 2)][1] == 2        # both batches' events at t=2 folded


def test_streaming_cox_multi_end_to_end(spark, tmp_path):
    """Streaming multi-covariate Cox twin: leaver partials folded
    across two real micro-batches; the on-read refit equals the batch
    cox_newton_multi over the union (cross-batch accumulation on
    shared (cell, time) keys exercised)."""
    import json as _json

    from clinpy_spark.operators.survival import cox_newton_multi
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.survival import (
        finalize_cox_multi, stream_cox_partials,
    )

    rows = [dict(t=(i * 37) % 30 + 1 + (i % 2) * 3,
                 e=1 if (i * 13) % 10 < 7 else 0,
                 x1=float(i % 2), x2=float((i // 2) % 2))
            for i in range(200)]
    src = tmp_path / "subjects"
    src.mkdir()
    for part, chunk in enumerate((rows[:90], rows[90:])):
        with open(src / f"part-{part}.json", "w") as fh:
            for r in chunk:
                fh.write(_json.dumps(r) + "\n")
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    stream = (
        spark.readStream.schema("t long, e int, x1 double, x2 double")
        .option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = stream_cox_partials(
        stream, cat, "cox_grid", "t", "e", ["x1", "x2"],
        checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = finalize_cox_multi(
        cat.table("cox_grid"), 2, iterations=4).collect()[0]
    batch = spark.createDataFrame(
        [(r["t"], r["e"], r["x1"], r["x2"]) for r in rows],
        "t long, e int, x1 double, x2 double")
    want = cox_newton_multi(
        batch, "t", "e", ["x1", "x2"], iterations=4).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.n_subjects == 200


def test_streaming_cox_multi_restart_new_checkpoint(spark, tmp_path):
    """The newest fold user inherits the lineage contract: a resumed
    stream with a FRESH checkpoint dir folds its batch 0 into the
    existing Cox leaver state instead of dropping it."""
    import json as _json

    from clinpy_spark.operators.survival import cox_newton_multi
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.survival import (
        finalize_cox_multi, stream_cox_partials,
    )

    rows = [dict(t=(i * 37) % 30 + 1 + (i % 2) * 3,
                 e=1 if (i * 13) % 10 < 7 else 0,
                 x1=float(i % 2), x2=float((i // 2) % 2))
            for i in range(160)]
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    schema = "t long, e int, x1 double, x2 double"

    def _run(dirname, ckname, chunk):
        src = tmp_path / dirname
        src.mkdir()
        with open(src / "part-0.json", "w") as fh:
            for r in chunk:
                fh.write(_json.dumps(r) + "\n")
        s = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", 1).json(str(src)))
        stream_cox_partials(
            s, cat, "cox_grid2", "t", "e", ["x1", "x2"],
            checkpoint=str(tmp_path / ckname)).awaitTermination(120)

    _run("c1", "ck1", rows[:100])
    _run("c2", "ck2", rows[100:])   # fresh checkpoint -> batch ids restart

    got = finalize_cox_multi(
        cat.table("cox_grid2"), 2, iterations=4).collect()[0]
    batch = spark.createDataFrame(
        [(r["t"], r["e"], r["x1"], r["x2"]) for r in rows], schema)
    want = cox_newton_multi(batch, "t", "e", ["x1", "x2"],
                            iterations=4).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.n_subjects == 160   # resumed lineage's rows NOT dropped


def test_streaming_ks_matches_batch(spark, tmp_path):
    """Streaming KS twin: per-value counts folded across two
    micro-batches + a frozen reference snapshot reproduce the batch
    ks_two_sample exactly (shared values across batches accumulate)."""
    from clinpy_spark.operators.drift import ks_two_sample
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.drift import (
        finalize_ks, stream_ks_counts, value_counts_partial,
    )

    ref_rows = [(float(v),) for v in (1, 1, 2, 3, 5, 8, 8)]
    b1 = [(float(v),) for v in (1, 2, 2, 9)]
    b2 = [(float(v),) for v in (2, 4, 9, 9)]
    src = tmp_path / "vals"
    src.mkdir()
    import json as _json
    for i, rows in enumerate((b1, b2)):
        with open(src / f"part-{i}.json", "w") as fh:
            for (v,) in rows:
                fh.write(_json.dumps({"value": v}) + "\n")
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = stream_ks_counts(stream, cat, "ks_cur", "value",
                         checkpoint=str(tmp_path / "ck"))
    q.awaitTermination(120)

    ref_df = spark.createDataFrame(ref_rows, "value double")
    ref_counts = value_counts_partial(ref_df, "value")
    (got,) = finalize_ks(ref_counts, cat.table("ks_cur")).collect()
    (exp,) = ks_two_sample(
        ref_df, spark.createDataFrame(b1 + b2, "value double"), "value"
    ).collect()
    assert (got.ks_d, got.n_a, got.n_b) == (exp.ks_d, exp.n_a, exp.n_b)
    assert got.n_b == 8


def test_streaming_ewma_group_split_across_arrow_chunks(spark, tmp_path):
    """Regression (r10 verdict #1): the r9 chunk-ordering fix covered
    funnel/transitions but missed EWMA, which is equally order-dependent.
    Force 100-row Arrow chunks and feed ONE key >100 rows in a single
    micro-batch with shuffled arrival order: a per-chunk sort walks the
    chunks in arrival order and diverges from the ts-ordered recurrence;
    the whole-group concat-then-sort must equal the batch EWMA."""
    import random

    from clinpy_spark.streaming.events import streaming_ewma

    rng = random.Random(11)
    n = 250
    rows = [(i, T0 + dt.timedelta(seconds=i), 1, "e", float(rng.randrange(1, 100)))
            for i in range(n)]
    shuffled = rows[:]
    rng.shuffle(shuffled)
    with open(tmp_path / "f0.json", "w") as fh:
        for eid, ts, uid, etype, val in shuffled:
            fh.write(json.dumps({
                "event_id": eid, "ts": ts.isoformat(), "user_id": uid,
                "event_type": etype, "value": val, "props": "{}",
            }) + "\n")

    alpha = 0.3
    expect = None
    for _, _, _, _, v in rows:  # ts order
        expect = v if expect is None else alpha * v + (1 - alpha) * expect

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        stream = read_event_stream(spark, str(tmp_path), fmt="json")
        q = (streaming_ewma(stream, alpha=alpha).writeStream.format("memory")
             .queryName("ewma_chunk").outputMode("update")
             .trigger(availableNow=True).start())
        _drain_stateful(spark, q, "ewma_chunk", 1)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    (got,) = spark.sql("select * from ewma_chunk").collect()
    assert got.n_events == n
    assert abs(got.ewma - expect) < 1e-9


def test_streaming_first_seen_min_ts_id_across_chunks(spark, tmp_path):
    """Regression (r10 verdict #2): 'first' within a micro-batch must be
    the min-(ts, id) event across ALL Arrow chunks, not iloc[0] of the
    first non-empty chunk in arrival order. File order puts the earliest
    event LAST so it lands in the final chunk."""
    from clinpy_spark.streaming.events import streaming_first_seen

    n = 250
    # descending ts in file order: event id 1000+i has ts T0 + (n-i) sec,
    # so the earliest event (id 1000+n-1, ts T0+1s) is the last file row.
    with open(tmp_path / "f0.json", "w") as fh:
        for i in range(n):
            fh.write(json.dumps({
                "event_id": 1000 + i,
                "ts": (T0 + dt.timedelta(seconds=n - i)).isoformat(),
                "user_id": 1, "event_type": "e", "value": 0.0, "props": "k",
            }) + "\n")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        stream = read_event_stream(spark, str(tmp_path), fmt="json")
        q = (streaming_first_seen(stream, key_col="props")
             .writeStream.format("memory").queryName("fs_chunk")
             .outputMode("update").trigger(availableNow=True).start())
        _drain_stateful(spark, q, "fs_chunk", 1)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    (got,) = spark.sql("select * from fs_chunk").collect()
    assert (got.props, got.first_event_id) == ("k", 1000 + n - 1)


def test_streaming_calibration_matches_batch(spark):
    """r11 verdict #7: the calibration table finalizes from the SAME
    (__s, np, nn) fold state the streaming AUC maintains — bit-exact
    against the batch reliability_table over the same scored rows
    (scores on a quarter grid so both summation orders are exact)."""
    from clinpy_spark.operators.classify import reliability_table
    from clinpy_spark.streaming.quality import (
        finalize_calibration, score_label_counts_partial,
    )

    rows = [Row(s=float((i * 3) % 9) / 4.0, y=(1 if (i * 7) % 5 < 2 else 0))
            for i in range(240)]
    df = spark.createDataFrame(rows)
    # two micro-batch halves folded additively, mimicking stream state
    p1 = score_label_counts_partial(df.filter(F.col("s") < 1.0), "s", "y")
    p2 = score_label_counts_partial(df.filter(F.col("s") >= 1.0), "s", "y")
    folded = p1.unionByName(p2).groupBy("__s").agg(
        F.sum("np").alias("np"), F.sum("nn").alias("nn"))
    got = sorted(tuple(r) for r in
                 finalize_calibration(folded, n_bins=5).collect())
    want = sorted(tuple(r) for r in
                  reliability_table(df, "s", "y", n_bins=5).collect())
    assert got == want


def test_streaming_trimmed_means_match_batch(spark):
    """The KS fold's (__v, n) state also finalizes the robust-location
    family: trimmed/winsorized/plain means match the batch expressions
    over the same values exactly."""
    from clinpy_spark.streaming.drift import finalize_trimmed_means

    vals = [float((i * 13) % 40) for i in range(200)] + [400.0, -100.0]
    df = spark.createDataFrame([Row(v=v) for v in vals])
    c1 = (df.filter(F.col("v") < 20).groupBy(F.col("v").alias("__v"))
          .agg(F.count(F.lit(1)).alias("n")))
    c2 = (df.filter(F.col("v") >= 20).groupBy(F.col("v").alias("__v"))
          .agg(F.count(F.lit(1)).alias("n")))
    folded = c1.unionByName(c2).groupBy("__v").agg(F.sum("n").alias("n"))
    got = finalize_trimmed_means(folded, 0.1, 0.9).collect()[0]
    qq = df.agg(F.expr("percentile(v, 0.1)").alias("ql"),
                F.expr("percentile(v, 0.9)").alias("qh")).collect()[0]
    batch = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.when((F.col("v") >= qq.ql)
                             & (F.col("v") <= qq.qh), F.col("v"))), 6)
        .alias("trimmed_mean"),
        F.round(F.avg(F.when(F.col("v") < qq.ql, qq.ql)
                      .when(F.col("v") > qq.qh, qq.qh)
                      .otherwise(F.col("v"))), 6).alias("winsorized_mean"),
        F.round(F.avg("v"), 6).alias("plain_mean"),
    ).collect()[0]
    assert got.n == batch.n
    assert got.trimmed_mean == batch.trimmed_mean
    assert got.winsorized_mean == batch.winsorized_mean
    assert got.plain_mean == batch.plain_mean


def test_fold_partials_replay_is_idempotent(spark, tmp_path):
    """r10 advice: a foreachBatch replay (same batch_id re-delivered
    after a pre-commit failure) must NOT double-add into the state
    table; a genuinely new batch_id must fold."""
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.fold import fold_partials

    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    p0 = spark.createDataFrame([("x", 3), ("y", 1)], "k string, n long")
    p1 = spark.createDataFrame([("x", 2)], "k string, n long")

    fold_partials(cat, "state", p0, 0, keys=["k"], counters=["n"])
    # replay of batch 0 with different content (the failed attempt is
    # re-executed; counts must not double)
    fold_partials(cat, "state", p0, 0, keys=["k"], counters=["n"])
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 3, "y": 1}

    fold_partials(cat, "state", p1, 1, keys=["k"], counters=["n"])
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 5, "y": 1}
    # a late replay of an OLD id after newer folds is also skipped
    fold_partials(cat, "state", p1, 1, keys=["k"], counters=["n"])
    fold_partials(cat, "state", p0, 0, keys=["k"], counters=["n"])
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 5, "y": 1}


def test_fold_partials_new_lineage_folds_from_batch_zero(spark, tmp_path):
    """r11 verdict #1: foreachBatch ids restart at 0 under a NEW
    checkpoint dir, so the replay rule must be lineage-scoped — a
    resumed stream's early batches fold; only same-lineage replays
    skip."""
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.fold import fold_partials

    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    p0 = spark.createDataFrame([("x", 3), ("y", 1)], "k string, n long")
    p1 = spark.createDataFrame([("x", 2)], "k string, n long")

    # run A folds batches 0 and 1 (with a replay of each, skipped)
    fold_partials(cat, "state", p0, 0, keys=["k"], counters=["n"], run_id="A")
    fold_partials(cat, "state", p0, 0, keys=["k"], counters=["n"], run_id="A")
    fold_partials(cat, "state", p1, 1, keys=["k"], counters=["n"], run_id="A")
    fold_partials(cat, "state", p1, 1, keys=["k"], counters=["n"], run_id="A")
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 5, "y": 1}

    # the stream restarts with a FRESH checkpoint: batch ids restart at
    # 0 under lineage B — these are NEW batches and must NOT be dropped
    fold_partials(cat, "state", p0, 0, keys=["k"], counters=["n"], run_id="B")
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 8, "y": 2}
    # ... while a replay WITHIN lineage B still skips
    fold_partials(cat, "state", p0, 0, keys=["k"], counters=["n"], run_id="B")
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 8, "y": 2}
    fold_partials(cat, "state", p1, 1, keys=["k"], counters=["n"], run_id="B")
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 10, "y": 2}


def test_stream_restart_new_checkpoint_folds_resumed_batches(spark, tmp_path):
    """End-to-end r11 verdict #1 'done' criterion: fold 2 micro-batches,
    restart the stream with a NEW checkpoint dir into the SAME state
    table, and assert the resumed batches are NOT dropped (batch id 0
    of the new lineage used to be misclassified as a replay)."""
    import json as _json

    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.survival import km_read, stream_km_partials

    b1 = [("a", 1, 1), ("a", 2, 1)]
    b2 = [("a", 2, 1), ("a", 3, 0)]
    b3 = [("a", 2, 1), ("b", 2, 1)]  # arrives after the restart
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    schema = "grp string, t long, evt int"

    def _write(src, i, rows):
        with open(src / f"part-{i}.json", "w") as fh:
            for g, t, e in rows:
                fh.write(_json.dumps({"grp": g, "t": t, "evt": e}) + "\n")

    src1 = tmp_path / "cohort1"
    src1.mkdir()
    _write(src1, 0, b1)
    _write(src1, 1, b2)
    s1 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(str(src1)))
    stream_km_partials(s1, cat, "km_grid", "t", "evt", "grp",
                       checkpoint=str(tmp_path / "ck1")).awaitTermination(120)

    # resume with a FRESH checkpoint dir (new lineage, batch ids restart
    # at 0) over the late-arriving file, into the SAME state table
    src2 = tmp_path / "cohort2"
    src2.mkdir()
    _write(src2, 0, b3)
    s2 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(str(src2)))
    stream_km_partials(s2, cat, "km_grid", "t", "evt", "grp",
                       checkpoint=str(tmp_path / "ck2")).awaitTermination(120)

    got = {(r.grp, r.t): r.n_events
           for r in km_read(cat.table("km_grid"), "t", "grp").collect()}
    assert got[("a", 2)] == 3           # b1 + b2 + resumed b3 all folded
    assert got[("b", 2)] == 1           # the resumed lineage's new group


def test_streaming_zscore_matches_batch_expanding_window(spark, tmp_path):
    """Stateful anomaly twin: cross-batch per-key (n, sum, sumsq)
    moments; flags must match the batch expanding-window z-score on
    ordered replay. Batch 1 builds history (one planted
    outlier mid-file, arriving out of ts order to exercise the
    concat-then-sort path); batch 2's outlier must be judged against
    the CARRIED-OVER moments."""
    from clinpy_spark.streaming.anomaly import (
        batch_zscore_flags, streaming_zscore)

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    base = [10.0, 12.0, 11.0, 10.0, 12.0, 11.0, 10.5, 11.5]
    rows1 = [(i, t(i), 1, "e", v) for i, v in enumerate(base)]
    rows1.append((50, t(50), 1, "e", 100.0))   # outlier inside batch 1
    rows1 += [(60 + i, t(60 + i), 1, "e", v) for i, v in enumerate(base)]
    rows2 = [(200, t(200), 1, "e", 11.0), (201, t(201), 1, "e", 200.0)]

    src = tmp_path / "src"
    src.mkdir()
    # FileStreamSource orders micro-batches by file MODIFICATION TIME;
    # two files written back-to-back share an mtime and the batch order
    # (and thus which events form "history") becomes nondeterministic.
    # Pin strictly increasing mtimes so batch 0 is p0, batch 1 is p1.
    for k, (fname, rows) in enumerate((("p0.json", rows1), ("p1.json", rows2))):
        with open(src / fname, "w") as fh:
            for eid, ts, uid, etype, val in rows:
                fh.write(json.dumps({
                    "event_id": eid, "ts": ts.isoformat(), "user_id": uid,
                    "event_type": etype, "value": val, "props": "{}",
                }) + "\n")
        mt = 1_700_000_000 + 60 * k
        os.utime(src / fname, (mt, mt))

    stream = (spark.readStream.schema(
                  "event_id long, ts timestamp, user_id long,"
                  "event_type string, value double, props string")
              .option("maxFilesPerTrigger", 1).json(str(src)))
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        q = (streaming_zscore(stream, z=3.0, min_prior=5)
             .writeStream.format("memory").queryName("zsc")
             .outputMode("update").trigger(availableNow=True).start())
        _drain_stateful(spark, q, "zsc", 2, timeout=180)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {(r.user_id, r.ts): (r.n_prior, r.zscore)
           for r in spark.sql("select * from zsc").collect()}

    batch = spark.createDataFrame(
        rows1 + rows2,
        "event_id long, ts timestamp, user_id long, event_type string,"
        "value double")
    want = {(r.user_id, r.ts): (r.n_prior, r.zscore)
            for r in batch_zscore_flags(batch, z=3.0, min_prior=5).collect()}
    assert set(got) == set(want) and len(got) == 2  # both planted outliers
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-4


def test_streaming_js_matches_batch(spark, tmp_path):
    """Streaming JS twin: the SAME maintained bin-count tables the PSI
    fold keeps yield the batch js_divergence exactly when the batch
    side is computed over the identical frozen reference edges
    (cross-batch accumulation exercised via two files)."""
    from clinpy_spark.operators.drift import js_divergence, quantile_edges
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.drift import (
        bin_counts_partial, finalize_js, stream_psi_counts,
    )

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    rows = [(i, t(i), 100 + i % 2, "view", float((i * 29) % 40)) for i in range(80)]
    ref_rows = [r for r in rows if r[2] % 2 == 0]
    cur_rows = [r for r in rows if r[2] % 2 == 1]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    ref_df = spark.createDataFrame(ref_rows, schema)
    cur_df = spark.createDataFrame(cur_rows, schema)

    n_bins = 5
    edges = quantile_edges(ref_df, "value", n_bins).collect()[0]["__edges"]

    for i, chunk in enumerate((cur_rows[:15], cur_rows[15:])):
        with open(tmp_path / f"f{i}.json", "w") as fh:
            for eid, ts, uid, etype, val in chunk:
                fh.write(json.dumps({
                    "event_id": eid, "ts": ts.isoformat(), "user_id": uid,
                    "event_type": etype, "value": val, "props": "{}",
                }) + "\n")
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = stream_psi_counts(stream, cat, "js_bins", "value", list(edges),
                          checkpoint=str(tmp_path / "ck_js"))
    q.awaitTermination(120)

    ref_counts = bin_counts_partial(ref_df, "value", list(edges))
    got = finalize_js(ref_counts, cat.table("js_bins"), n_bins).collect()
    # batch twin: js_divergence fits edges from ref — the SAME frozen
    # edges by construction (same reference, same quantile call)
    want = js_divergence(ref_df, cur_df, "value", n_bins=n_bins).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_streaming_w1_matches_exact_emd(spark, tmp_path):
    """Streaming W1 twin: the per-value count tables the KS fold keeps
    yield the exact empirical earth-mover distance (hand-computed on a
    small pair of samples), accumulated across two micro-batch files."""
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.drift import (
        finalize_w1, stream_ks_counts, value_counts_partial,
    )

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    # ref: 0,0,10,10  cur: 5,5,15,15 -> CDF gaps: [0,5):0.5, [5,10):0,
    # [10,15):0.5 -> W1 = 0.5*5 + 0 + 0.5*5 = 5.0; ks_d = 0.5
    ref_vals = [0.0, 0.0, 10.0, 10.0]
    cur_vals = [5.0, 5.0, 15.0, 15.0]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    ref_df = spark.createDataFrame(
        [(i, t(i), 1, "view", v) for i, v in enumerate(ref_vals)], schema)

    for i, chunk in enumerate((cur_vals[:2], cur_vals[2:])):
        with open(tmp_path / f"f{i}.json", "w") as fh:
            for j, val in enumerate(chunk):
                fh.write(json.dumps({
                    "event_id": 100 + i * 10 + j, "ts": t(j).isoformat(),
                    "user_id": 2, "event_type": "view", "value": val,
                    "props": "{}",
                }) + "\n")
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = stream_ks_counts(stream, cat, "w1_vals", "value",
                         checkpoint=str(tmp_path / "ck_w1"))
    q.awaitTermination(120)

    import pytest

    ref_counts = value_counts_partial(ref_df, "value")
    out = finalize_w1(ref_counts, cat.table("w1_vals")).collect()[0]
    assert out.w1 == pytest.approx(5.0)
    assert out.ks_d == pytest.approx(0.5)
    assert out.ref_n == 4 and out.cur_n == 4


def test_streaming_cusum_matches_batch(spark, tmp_path):
    """Streaming CUSUM twin: per-day count partials folded across two
    micro-batch files reproduce the batch cusum_changepoint over the
    same days exactly (counts are the additive sufficient statistic;
    the read recomputes the whole-series CUSUM on the bounded
    series)."""
    import pytest

    from clinpy_spark.operators.windows import cusum_changepoint
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.anomaly import (
        finalize_cusum, stream_period_counts,
    )

    day = lambda d, m: dt.datetime(2024, 1, 1 + d, 8, m)
    # days 0-5: volumes 3,3,3,9,9,9 (level shift at day 3)
    events = []
    eid = 0
    for d in range(6):
        for m in range(3 if d < 3 else 9):
            events.append((eid, day(d, m))); eid += 1
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    rows = [(e, ts, 1, "view", 0.0) for e, ts in events]

    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with open(tmp_path / f"f{i}.json", "w") as fh:
            for eid2, ts, uid, etype, val in chunk:
                fh.write(json.dumps({
                    "event_id": eid2, "ts": ts.isoformat(), "user_id": uid,
                    "event_type": etype, "value": val, "props": "{}",
                }) + "\n")
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    stream = read_event_stream(spark, str(tmp_path), fmt="json")
    q = stream_period_counts(stream, cat, "day_counts",
                             checkpoint=str(tmp_path / "ck_cu"))
    q.awaitTermination(120)

    got = finalize_cusum(cat.table("day_counts")).collect()[0]
    batch = spark.createDataFrame(rows, schema)
    daily = batch.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .alias("__p")).agg(F.count(F.lit(1)).alias("n"))
    want = cusum_changepoint(daily, "__p", "n").collect()[0]
    assert tuple(got) == tuple(want)
    assert got.max_cusum_pos > 0 and got.mean_x == pytest.approx(6.0)


def test_fold_partials_interleaved_lineages_keep_own_stamps(spark, tmp_path):
    """r12 advice: the stamp is a LEDGER of (lineage, max batch id)
    pairs, not a single slot — an older lineage resumed AFTER a newer
    lineage folded into the same table must still recognize its own
    replays (the single-slot stamp silently degraded to at-least-once
    across interleaved lineages)."""
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.fold import fold_partials

    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    pa = spark.createDataFrame([("x", 3)], "k string, n long")
    pb = spark.createDataFrame([("x", 10)], "k string, n long")

    fold_partials(cat, "state", pa, 0, keys=["k"], counters=["n"], run_id="A")
    fold_partials(cat, "state", pa, 1, keys=["k"], counters=["n"], run_id="A")
    # lineage B folds in between
    fold_partials(cat, "state", pb, 0, keys=["k"], counters=["n"], run_id="B")
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 16}
    # lineage A's replay of its batch 1 arrives AFTER B folded: the
    # single-slot stamp would have double-folded it
    fold_partials(cat, "state", pa, 1, keys=["k"], counters=["n"], run_id="A")
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 16}
    # ... and B's replay still skips too
    fold_partials(cat, "state", pb, 0, keys=["k"], counters=["n"], run_id="B")
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 16}
    # genuinely new batches on BOTH lineages still fold
    fold_partials(cat, "state", pa, 2, keys=["k"], counters=["n"], run_id="A")
    fold_partials(cat, "state", pb, 1, keys=["k"], counters=["n"], run_id="B")
    got = {r.k: r.n for r in cat.table("state").select("k", "n").collect()}
    assert got == {"x": 29}


def test_batch_refresh_preserves_stream_stamps(spark, tmp_path):
    """r12 advice: a plain batch refresh_stats (batch_id=None) against
    a stream-maintained stats table must carry the lineage stamps
    through the merge — dropping them made the still-running stream's
    next replay pass the stamp check and double-fold."""
    from clinpy_spark.operators.incremental import (
        finalize, refresh_stats,
    )
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.fold import BATCH_ID_COL

    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    b0 = spark.createDataFrame([("g", 1.0), ("g", 3.0)], "k string, v double")
    b1 = spark.createDataFrame([("g", 5.0)], "k string, v double")

    # a stream owner folds batches 0 and 1 under lineage S
    refresh_stats(cat, "stats", b0, ["k"], ["v"], batch_id=0, run_id="S")
    refresh_stats(cat, "stats", b1, ["k"], ["v"], batch_id=1, run_id="S")
    # an ad-hoc BATCH caller appends unstamped data in between
    extra = spark.createDataFrame([("g", 7.0)], "k string, v double")
    refresh_stats(cat, "stats", extra, ["k"], ["v"])
    assert BATCH_ID_COL in cat.table("stats").columns  # stamp survived
    # the stream's pre-commit failure replays batch 1: must SKIP
    refresh_stats(cat, "stats", b1, ["k"], ["v"], batch_id=1, run_id="S")
    row = finalize(cat.table("stats"), ["v"]).collect()[0]
    assert row.v_count == 4 and row.v_mean == (1 + 3 + 5 + 7) / 4
    # a genuinely new stream batch still folds
    b2 = spark.createDataFrame([("g", 9.0)], "k string, v double")
    refresh_stats(cat, "stats", b2, ["k"], ["v"], batch_id=2, run_id="S")
    row = finalize(cat.table("stats"), ["v"]).collect()[0]
    assert row.v_count == 5 and row.v_mean == 25 / 5


def test_streaming_negbin_fresh_checkpoint(spark, tmp_path):
    """r12 verdict #8: the NB2 streaming twin's dispersion refit on a
    FOLD RESTART — fold 2 micro-batches under one checkpoint, restart
    with a fresh checkpoint (batch ids back at 0) over a late file into
    the same grid, and assert the refit (Poisson start, moment
    dispersion, NB2 Fisher refit) equals the batch negbin_newton over
    the union of all rows."""
    import json as _json

    from clinpy_spark.operators.assoc import negbin_newton
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.glm import finalize_negbin, stream_negbin_grid

    rows1 = [(float(i % 3), float((i * 7) % 11)) for i in range(60)]
    rows2 = [(float(i % 3), float((i * 5) % 9)) for i in range(40)]
    rows3 = [(float(i % 3), float((i * 11) % 13)) for i in range(30)]
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    schema = "x double, y double"

    def _write(src, i, rows):
        with open(src / f"part-{i}.json", "w") as fh:
            for x, y in rows:
                fh.write(_json.dumps({"x": x, "y": y}) + "\n")

    src1 = tmp_path / "src1"
    src1.mkdir()
    _write(src1, 0, rows1)
    _write(src1, 1, rows2)
    s1 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(str(src1)))
    stream_negbin_grid(s1, cat, "nb_grid", "x", "y",
                       checkpoint=str(tmp_path / "ck1")).awaitTermination(120)

    src2 = tmp_path / "src2"
    src2.mkdir()
    _write(src2, 0, rows3)
    s2 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(str(src2)))
    stream_negbin_grid(s2, cat, "nb_grid", "x", "y",
                       checkpoint=str(tmp_path / "ck2")).awaitTermination(120)

    got = finalize_negbin(cat.table("nb_grid")).collect()[0]
    batch = spark.createDataFrame(rows1 + rows2 + rows3, schema)
    want = negbin_newton(batch, "x", "y").collect()[0]
    assert tuple(got) == tuple(want)
    assert got.beta1 is not None and got.alpha is not None


def test_streaming_finegray_fresh_checkpoint_twin(spark, tmp_path):
    """Fine-Gray streaming twin: fold 2 micro-batches, restart with a
    FRESH checkpoint over a late file into the same leaver table, and
    assert both the score test and the subdistribution MLE refit on
    read equal the batch operators over the union of all subjects
    (IPCW weights and censoring KM rebuild from folded counters)."""
    import json as _json

    from clinpy_spark.operators.survival import finegray_newton, finegray_score
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.survival import (
        finalize_finegray_beta, finalize_finegray_score,
        stream_finegray_partials,
    )

    def mk(seed, n):
        out = []
        for i in range(n):
            t = (i * 29 + seed) % 25 + 1
            r = (i * 7 + seed) % 10
            st = 1 if r < 4 else (2 if r < 6 else 0)
            out.append((t, st, i % 2))
        return out

    b1, b2, b3 = mk(0, 80), mk(3, 60), mk(5, 50)
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    schema = "t long, st int, x int"

    def _write(src, i, rows):
        with open(src / f"part-{i}.json", "w") as fh:
            for t, st, x in rows:
                fh.write(_json.dumps({"t": t, "st": st, "x": x}) + "\n")

    src1 = tmp_path / "src1"
    src1.mkdir()
    _write(src1, 0, b1)
    _write(src1, 1, b2)
    s1 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(str(src1)))
    stream_finegray_partials(
        s1, cat, "fg_grid", "t", "st", "x",
        checkpoint=str(tmp_path / "ck1")).awaitTermination(120)

    src2 = tmp_path / "src2"
    src2.mkdir()
    _write(src2, 0, b3)
    s2 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(str(src2)))
    stream_finegray_partials(
        s2, cat, "fg_grid", "t", "st", "x",
        checkpoint=str(tmp_path / "ck2")).awaitTermination(120)

    batch = spark.createDataFrame(b1 + b2 + b3, schema)
    got_s = finalize_finegray_score(cat.table("fg_grid")).collect()[0]
    want_s = finegray_score(batch, "t", "st", "x").collect()[0]
    assert tuple(got_s) == tuple(want_s)
    assert got_s.n_subjects == 190 and got_s.n_competing > 0

    got_b = finalize_finegray_beta(cat.table("fg_grid")).collect()[0]
    want_b = finegray_newton(batch, "t", "st", "x").collect()[0]
    assert tuple(got_b) == tuple(want_b)
    assert got_b.beta is not None


def test_streaming_multinomial_matches_batch(spark, tmp_path):
    """Softmax twin: per-(covariate, class) counts are integer-additive
    across micro-batches; the folded table refits the k=3 MLE on read,
    exactly matching the batch fitter over the same rows."""
    from clinpy_spark.operators.assoc import multinomial_newton
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.fold import fold_partials
    from clinpy_spark.streaming.glm import (
        finalize_multinomial, multinomial_count_partial,
    )

    rows = [Row(x=float(i % 5), lab="anr"[(i * 7 + i // 5) % 3])
            for i in range(300)]
    df = spark.createDataFrame(rows)
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    p1 = multinomial_count_partial(df.filter(F.col("x") < 2), "x", "lab")
    p2 = multinomial_count_partial(df.filter(F.col("x") >= 2), "x", "lab")
    fold_partials(cat, "mn_counts", p1, 0, keys=["__x", "__y"],
                  counters=["n"], run_id="A")
    fold_partials(cat, "mn_counts", p2, 1, keys=["__x", "__y"],
                  counters=["n"], run_id="A")
    # a replayed batch must not perturb the fit
    fold_partials(cat, "mn_counts", p2, 1, keys=["__x", "__y"],
                  counters=["n"], run_id="A")
    got = finalize_multinomial(
        cat.table("mn_counts"), iterations=5).collect()[0]
    want = multinomial_newton(df, "x", "lab", iterations=5).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.class_ref == "a" and got.beta1_1 is not None


def test_streaming_ordinal_shares_multinomial_fold(spark, tmp_path):
    """ONE per-(covariate, class) count fold serves BOTH readers: the
    ordinal refit over the folded table equals the batch fitter, from
    the same state table the multinomial twin reads."""
    from clinpy_spark.operators.assoc import ordinal_newton
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.fold import fold_partials
    from clinpy_spark.streaming.glm import (
        finalize_multinomial, finalize_ordinal, multinomial_count_partial,
    )

    lv = ["lo", "mid", "hi"]
    rows = [Row(x=float(i % 4), g=lv[(i * 7 + i // 4) % 3])
            for i in range(240)]
    df = spark.createDataFrame(rows)
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    p1 = multinomial_count_partial(df.filter(F.col("x") < 2), "x", "g")
    p2 = multinomial_count_partial(df.filter(F.col("x") >= 2), "x", "g")
    fold_partials(cat, "cls_counts", p1, 0, keys=["__x", "__y"],
                  counters=["n"], run_id="A")
    fold_partials(cat, "cls_counts", p2, 1, keys=["__x", "__y"],
                  counters=["n"], run_id="A")
    got = finalize_ordinal(
        cat.table("cls_counts"), lv, iterations=6).collect()[0]
    want = ordinal_newton(df, "x", "g", lv, iterations=6).collect()[0]
    assert tuple(got) == tuple(want)
    assert got.beta is not None
    # the same folded table still serves the nominal reader
    mn = finalize_multinomial(cat.table("cls_counts")).collect()[0]
    assert mn.n == 240


def test_streaming_cox_tv_fresh_checkpoint_twin(spark, tmp_path):
    """Time-varying Cox streaming twin: fold 2 micro-batches of
    treatment-switch episodes, restart with a FRESH checkpoint over a
    late file into the same partial table, and assert the refit on
    read equals the batch cox_newton_tv over the union of all
    episodes (risk sets rebuild as strict prefix sums of the folded
    net flows)."""
    import json as _json

    from clinpy_spark.operators.survival import cox_newton_tv
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.survival import (
        finalize_cox_tv, stream_cox_tv_partials,
    )

    def mk(seed, n):
        out = []
        for i in range(n):
            dur = (i * 29 + seed) % 40 + 2
            evt = 1 if (i * 7 + seed) % 3 < 2 else 0
            sw = (i * 13 + seed) % 60
            if sw >= dur:
                out.append((0, dur, evt, 0))
            else:
                if sw > 0:
                    out.append((0, sw, 0, 0))
                out.append((sw, dur, evt, 1))
        return out

    b1, b2, b3 = mk(0, 60), mk(3, 50), mk(5, 40)
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    schema = "a long, b long, e int, x int"

    def _write(src, i, rows):
        with open(src / f"part-{i}.json", "w") as fh:
            for a, b, e, x in rows:
                fh.write(_json.dumps({"a": a, "b": b, "e": e, "x": x})
                         + "\n")

    src1 = tmp_path / "src1"
    src1.mkdir()
    _write(src1, 0, b1)
    _write(src1, 1, b2)
    s1 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(str(src1)))
    stream_cox_tv_partials(
        s1, cat, "coxtv_grid", "a", "b", "e", "x",
        checkpoint=str(tmp_path / "ck1")).awaitTermination(120)

    src2 = tmp_path / "src2"
    src2.mkdir()
    _write(src2, 0, b3)
    s2 = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(str(src2)))
    stream_cox_tv_partials(
        s2, cat, "coxtv_grid", "a", "b", "e", "x",
        checkpoint=str(tmp_path / "ck2")).awaitTermination(120)

    batch = spark.createDataFrame(b1 + b2 + b3, schema)
    got = finalize_cox_tv(cat.table("coxtv_grid")).collect()[0]
    want = cox_newton_tv(batch, "a", "b", "e", "x").collect()[0]
    assert tuple(got) == tuple(want)
    assert got.beta is not None and got.n_episodes == len(b1 + b2 + b3)


def test_streaming_mcf_shares_cox_tv_fold(spark, tmp_path):
    """One fold state, two readers: the stream_cox_tv_partials table
    also serves the recurrent-event MCF — finalize_mcf over the folded
    flows equals the batch mcf_curve over the union of all episodes
    (binary per-episode events, as the shared fold's schema carries)."""
    import json as _json

    from clinpy_spark.operators.survival import mcf_curve
    from clinpy_spark.session import ProjectCatalog
    from clinpy_spark.streaming.survival import (
        finalize_mcf, stream_cox_tv_partials,
    )

    def mk(seed, n):
        out = []
        for i in range(n):
            a = (i * 17 + seed) % 25
            b = a + (i * 11 + seed) % 15 + 1
            e = 1 if (i * 7 + seed) % 3 < 2 else 0
            out.append((a, b, e, i % 2))
        return out

    b1, b2 = mk(0, 70), mk(4, 50)
    cat = ProjectCatalog(spark, str(tmp_path / "proj"))
    schema = "a long, b long, e int, x int"
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate((b1, b2)):
        with open(src / f"part-{i}.json", "w") as fh:
            for a, b, e, x in rows:
                fh.write(_json.dumps({"a": a, "b": b, "e": e, "x": x})
                         + "\n")
    s = (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).json(str(src)))
    stream_cox_tv_partials(
        s, cat, "coxtv_mcf_grid", "a", "b", "e", "x",
        checkpoint=str(tmp_path / "ck")).awaitTermination(120)

    batch = spark.createDataFrame(b1 + b2, schema)
    got = sorted(finalize_mcf(cat.table("coxtv_mcf_grid")).collect(),
                 key=lambda r: r["t"])
    want = sorted(mcf_curve(batch, "a", "b", "e").collect(),
                  key=lambda r: r["t"])
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
