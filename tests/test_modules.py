"""Config-driven e2e module tests, mirroring the reference's test strategy
(SURVEY §5): create-source inline elements → pipeline → assert values.
Reference model: AggregationTransformTest.java:14-150 etc."""

import pytest

from pipeline_spark.config import parse_config
from pipeline_spark.executor import run_pipeline

BASE = """
sources:
  - name: create1
    module: create
    timestampAttribute: timestampField
    parameters:
      elements:
        - {stringField: a, intField: 1, floatField: 1.5,  boolField: true,  timestampField: "2024-10-10T00:00:00Z"}
        - {stringField: a, intField: 2, floatField: -2.5, boolField: false, timestampField: "2024-10-11T00:00:00Z"}
        - {stringField: a, intField: 3, floatField: 0.0,  boolField: true,  timestampField: "2024-10-12T00:00:00Z"}
        - {stringField: b, intField: 4, floatField: 4.25, boolField: false, timestampField: "2024-10-13T00:00:00Z"}
        - {stringField: b, intField: 5, floatField: null, boolField: true,  timestampField: "2024-10-14T00:00:00Z"}
        - {stringField: c, intField: 6, floatField: 4.25, boolField: false, timestampField: "2024-10-15T00:00:00Z"}
    schema:
      fields:
        - {name: stringField, type: string, mode: required}
        - {name: intField, type: int32, mode: required}
        - {name: floatField, type: float64}
        - {name: boolField, type: bool, mode: required}
        - {name: timestampField, type: timestamp, mode: required}
"""


def run(spark, yaml_text):
    return run_pipeline(spark, parse_config(yaml_text))


def test_aggregation_ops(spark):
    out = run(
        spark,
        BASE
        + """
transforms:
  - name: agg
    module: aggregation
    inputs: [create1]
    timestampAttribute: timestampField
    parameters:
      groupFields: [stringField]
      aggregations:
        - {name: cnt, op: count}
        - {name: sum_i, op: sum, field: intField}
        - {name: max_f, op: max, field: floatField}
        - {name: min_f, op: min, field: floatField}
        - {name: first_i, op: first, field: intField}
        - {name: last_i, op: last, field: intField}
        - {name: am, op: argmax, field: intField, comparingField: floatField}
        - {name: avg_i, op: avg, field: intField}
        - {name: std_i, op: std, field: intField}
        - {name: arr, op: array_agg, field: intField}
        - {name: cond_cnt, op: count, condition: {key: boolField, op: "=", value: true}}
""",
    )["agg"]
    rows = {r["stringField"]: r for r in out.collect()}
    a, b, c = rows["a"], rows["b"], rows["c"]
    assert a["cnt"] == 3 and a["sum_i"] == 6
    assert a["max_f"] == 1.5 and a["min_f"] == -2.5
    assert a["first_i"] == 1 and a["last_i"] == 3
    assert a["am"] == 1  # argmax floatField=1.5 → intField 1
    assert abs(a["avg_i"] - 2.0) < 1e-9
    assert abs(a["std_i"] - 1.0) < 1e-9
    assert sorted(a["arr"]) == [1, 2, 3]
    assert a["cond_cnt"] == 2
    assert b["cnt"] == 2 and b["max_f"] == 4.25
    assert c["cnt"] == 1


def test_partition(spark):
    outs = run(
        spark,
        BASE
        + """
transforms:
  - name: parts
    module: partition
    inputs: [create1]
    parameters:
      exclusive: true
      partitions:
        - {name: small, filters: [{key: intField, op: "<=", value: 2}]}
        - {name: mid, filters: [{key: intField, op: "<=", value: 4}]}
""",
    )
    assert sorted(r["intField"] for r in outs["parts.small"].collect()) == [1, 2]
    assert sorted(r["intField"] for r in outs["parts.mid"].collect()) == [3, 4]
    assert sorted(r["intField"] for r in outs["parts.excluded"].collect()) == [5, 6]


def test_union_null_padding(spark):
    outs = run(
        spark,
        BASE
        + """
  - name: create2
    module: create
    kind: source
    parameters:
      elements:
        - {stringField: z, longField: 100}
    schema:
      fields:
        - {name: stringField, type: string}
        - {name: longField, type: int64}
transforms:
  - name: u
    module: union
    inputs: [create1, create2]
    parameters: {}
""".replace("sources:\n", "sources:\n", 1),
    )
    df = outs["u"]
    assert df.count() == 7
    assert "longField" in df.columns and "intField" in df.columns


def test_sql_join(spark):
    outs = run(
        spark,
        BASE
        + """
transforms:
  - name: q
    module: sql
    inputs: [create1]
    parameters:
      sql: |
        SELECT stringField, count(*) AS cnt, sum(intField) AS s
        FROM create1 WHERE boolField GROUP BY stringField ORDER BY stringField
""",
    )
    rows = outs["q"].collect()
    assert [(r["stringField"], r["cnt"], r["s"]) for r in rows] == [("a", 2, 4), ("b", 1, 5)]


def test_lookup_broadcast(spark):
    outs = run(
        spark,
        BASE
        + """
  - name: dim
    module: create
    parameters:
      elements:
        - {stringField: a, label: alpha}
        - {stringField: b, label: beta}
    schema:
      fields:
        - {name: stringField, type: string}
        - {name: label, type: string}
transforms:
  - name: enriched
    module: lookup
    inputs: [create1]
    sideInputs: [dim]
    parameters:
      keyFields: [stringField]
""",
    )
    rows = outs["enriched"].collect()
    labels = {r["intField"]: r["label"] for r in rows}
    assert labels[1] == "alpha" and labels[4] == "beta" and labels[6] is None


def test_limit_per_key(spark):
    outs = run(
        spark,
        BASE
        + """
transforms:
  - name: lim
    module: limit
    inputs: [create1]
    timestampAttribute: timestampField
    parameters:
      count: 1
      groupFields: [stringField]
""",
    )
    assert sorted(r["intField"] for r in outs["lim"].collect()) == [1, 4, 6]


def test_stateful_select_running_agg(spark):
    outs = run(
        spark,
        BASE
        + """
transforms:
  - name: st
    module: select
    inputs: [create1]
    timestampAttribute: timestampField
    parameters:
      groupFields: [stringField]
      select:
        - {name: stringField}
        - {name: intField}
        - {name: run_sum, func: sum, field: intField, range: {count: 2}}
        - {name: prev, func: lag, expression: "intField[1]"}
        - {name: rn, func: row_number}
""",
    )
    rows = {r["intField"]: r for r in outs["st"].collect()}
    assert rows[1]["run_sum"] == 1 and rows[2]["run_sum"] == 3 and rows[3]["run_sum"] == 5
    assert rows[2]["prev"] == 1.0 and rows[1]["prev"] is None
    assert rows[3]["rn"] == 3 and rows[4]["rn"] == 1


def test_compare(spark):
    outs = run(
        spark,
        BASE
        + """
  - name: other
    module: create
    parameters:
      elements:
        - {stringField: a, intField: 1}
        - {stringField: b, intField: 99}
    schema:
      fields:
        - {name: stringField, type: string}
        - {name: intField, type: int32}
transforms:
  - name: fa
    module: filter
    inputs: [create1]
    parameters:
      filters: [{key: intField, op: in, value: [1, 4]}]
  - name: sel
    module: select
    inputs: [fa]
    parameters:
      select: [{name: stringField}, {name: intField}]
  - name: cmp
    module: compare
    inputs: [sel, other]
    parameters:
      primaryKeyFields: [stringField]
""",
    )
    rows = {r["stringField"]: r["status"] for r in outs["cmp"].collect()}
    assert rows["b"] == "mismatch"
    assert "a" not in rows  # identical


def test_unnest(spark):
    outs = run(
        spark,
        """
sources:
  - name: nested
    module: create
    parameters:
      elements:
        - {k: a, arr: [1, 2]}
        - {k: b, arr: []}
    schema:
      fields:
        - {name: k, type: string}
        - {name: arr, type: int64, mode: repeated}
transforms:
  - name: flat
    module: unnest
    inputs: [nested]
    parameters:
      flattenField: arr
""",
    )
    rows = [(r["k"], r["arr"]) for r in outs["flat"].collect()]
    assert sorted(rows, key=str) == [("a", 1), ("a", 2), ("b", None)]


def test_waits_ordering(spark, tmp_path):
    # `waits` gates module execution on completion of another module
    # (reference: MPipeline.java:160-168)
    out_a = str(tmp_path / "a")
    outs = run(
        spark,
        BASE
        + f"""
transforms:
  - name: gated
    module: select
    inputs: [create1]
    waits: [writer_a]
    parameters:
      select: [{{name: stringField}}]
sinks:
  - name: writer_a
    module: storage
    inputs: [create1]
    parameters: {{format: parquet, output: {out_a}}}
""",
    )
    import os

    assert os.path.isdir(out_a)
    assert outs["gated"].count() == 6


def test_multi_input_aggregation(spark):
    outs = run(
        spark,
        BASE
        + """
  - name: create2
    module: create
    parameters:
      elements:
        - {stringField: a, longField: 100}
        - {stringField: z, longField: 5}
    schema:
      fields:
        - {name: stringField, type: string}
        - {name: longField, type: int64}
transforms:
  - name: agg
    module: aggregation
    inputs: [create1, create2]
    parameters:
      groupFields: [stringField]
      aggregations:
        - input: create1
          fields:
            - {name: sum_i, op: sum, field: intField}
        - input: create2
          fields:
            - {name: sum_l, op: sum, field: longField}
""",
    )
    rows = {r["stringField"]: (r["sum_i"], r["sum_l"]) for r in outs["agg"].collect()}
    # outer-join semantics: keys present in either input, null-fill
    assert rows["a"] == (6, 100)
    assert rows["b"] == (9, None)
    assert rows["z"] == (None, 5)


def test_struct_each_and_repeated(spark):
    outs = run(
        spark,
        """
sources:
  - name: nested
    module: create
    parameters:
      elements:
        - {k: a, items: [{v: 1, w: x}, {v: 2, w: y}]}
    schema:
      fields:
        - {name: k, type: string}
        - name: items
          type: element
          mode: repeated
          fields:
            - {name: v, type: int64}
            - {name: w, type: string}
transforms:
  - name: sel
    module: select
    inputs: [nested]
    parameters:
      select:
        - {name: k}
        - name: shaped
          func: struct
          each: items
          fields:
            - {name: v}
            - {name: tag, field: w}
        - name: single
          func: struct
          mode: repeated
          fields:
            - {name: k}
""",
    )
    row = outs["sel"].collect()[0]
    assert [(e["v"], e["tag"]) for e in row["shaped"]] == [(1, "x"), (2, "y")]
    assert row["single"][0]["k"] == "a"


def test_deserialize_json_inference_and_dead_letter(spark):
    outs = run(
        spark,
        """
sources:
  - name: raw
    module: create
    parameters:
      elements:
        - {id: 1, payload: '{"a": 5, "b": "ok"}'}
        - {id: 2, payload: '{"a": 7, "b": "fine"}'}
        - {id: 3, payload: 'not json at all'}
    schema:
      fields:
        - {name: id, type: int64}
        - {name: payload, type: string}
transforms:
  - name: parsed
    module: deserialize
    inputs: [raw]
    failFast: false
    parameters:
      field: payload
""",
    )
    ok = outs["parsed"].collect()
    assert sorted((r["a"], r["b"]) for r in ok) == [(5, "ok"), (7, "fine")]
    fails = outs["parsed.failures"].collect()
    assert len(fails) == 1 and fails[0]["id"] == 3


def test_bytes_encode_decode_negative_roundtrip(spark):
    """HBase-style big-endian encode must preserve negatives (two's
    complement truncation, not lpad sign-byte collapse); decode must
    re-sign-extend. Reference: select/Bytes.java."""
    outs = run(
        spark,
        """
sources:
  - name: nums
    module: create
    parameters:
      elements:
        - {i: -123, j: -1}
        - {i: -124, j: 2147483647}
        - {i: 123, j: -2147483648}
        - {i: 0, j: 0}
    schema:
      fields:
        - {name: i, type: int32, mode: required}
        - {name: j, type: int32, mode: required}
transforms:
  - name: enc
    module: select
    inputs: [nums]
    parameters:
      select:
        - {name: i}
        - {name: j}
        - {name: ib, func: bytes_encode, field: i}
        - {name: jb, func: bytes_encode, field: j}
  - name: dec
    module: select
    inputs: [enc]
    parameters:
      select:
        - {name: i}
        - {name: j}
        - {name: ib}
        - {name: i2, func: bytes_decode, field: ib, type: int32}
        - {name: j2, func: bytes_decode, field: jb, type: int32}
""",
    )
    rows = outs["dec"].collect()
    encs = {r["i"]: bytes(r["ib"]) for r in rows}
    # int32 big-endian two's complement — distinct negatives stay distinct
    assert encs[-123] == (-123).to_bytes(4, "big", signed=True)
    assert encs[-124] == (-124).to_bytes(4, "big", signed=True)
    assert encs[123] == (123).to_bytes(4, "big", signed=True)
    for r in rows:
        assert r["i2"] == r["i"] and r["j2"] == r["j"]


def test_crypto_key_not_in_plan(spark):
    """AES key must be a bound literal, not interpolated into the SQL expr
    (it would leak via explain plans / Spark UI)."""
    import base64

    key = b"0123456789abcdef"
    outs = run(
        spark,
        f"""
sources:
  - name: s
    module: create
    parameters:
      elements:
        - {{v: secret-value}}
    schema:
      fields:
        - {{name: v, type: string, mode: required}}
transforms:
  - name: enc
    module: crypto
    inputs: [s]
    parameters:
      mode: encrypt
      fields: [v]
      key: {base64.b64encode(key).decode()}
  - name: dec
    module: crypto
    inputs: [enc]
    parameters:
      mode: decrypt
      fields: [v]
      key: {base64.b64encode(key).decode()}
""",
    )
    assert outs["dec"].collect()[0]["v"] == "secret-value"
    plan = outs["enc"]._jdf.queryExecution().toString()
    assert key.hex() not in plan.lower()


@pytest.mark.parametrize(
    "sink_module,target_param",
    [
        ("spanner", "table: users"),
        ("firestore", "collection: users"),
        ("datastore", "kind: users"),
        ("bigtable", "tableId: users"),
        ("pubsub", "topic: projects/p/topics/users"),
    ],
)
def test_connector_sink_writes_mutations(spark, tmp_path, sink_module, target_param):
    """Every client sink streams executor-side mutation batches through the
    injectable factory: op column respected, op stripped from the row.
    Reference: SpannerSink.java:32-1066 MutationOp handling."""
    from pipeline_spark.testing import read_spool

    spool = str(tmp_path / "spool")
    run(
        spark,
        f"""
sources:
  - name: src
    module: create
    parameters:
      elements:
        - {{id: 1, v: a, __op__: INSERT}}
        - {{id: 2, v: b, __op__: DELETE}}
        - {{id: 3, v: c}}
    schema:
      fields:
        - {{name: id, type: int64, mode: required}}
        - {{name: v, type: string, mode: required}}
        - {{name: __op__, type: string}}
sinks:
  - name: out
    module: {sink_module}
    inputs: [src]
    parameters:
      {target_param}
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
      batchSize: 2
""",
    )
    muts = sorted(read_spool(spool), key=lambda m: m["row"]["id"])
    assert [m["op"] for m in muts] == ["INSERT", "DELETE", "UPSERT"]
    assert all("__op__" not in m["row"] for m in muts)
    assert muts[0]["table"] in ("users", "projects/p/topics/users")
    assert [m["row"]["v"] for m in muts] == ["a", "b", "c"]


def test_connector_sink_failure_propagates(spark, tmp_path):
    from pipeline_spark.testing import read_spool

    spool = str(tmp_path / "spool")
    with pytest.raises(Exception):
        run(
            spark,
            f"""
sources:
  - name: src
    module: create
    parameters:
      elements:
        - {{id: 1, v: BOOM}}
    schema:
      fields:
        - {{name: id, type: int64, mode: required}}
        - {{name: v, type: string, mode: required}}
sinks:
  - name: out
    module: spanner
    inputs: [src]
    parameters:
      table: users
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
""",
        )
    assert read_spool(spool) == []


def test_connector_sink_streaming_foreachbatch(spark, tmp_path):
    """Streaming input goes through foreachBatch → per-partition client
    writes (availableNow catch-up)."""
    import json

    from pipeline_spark.testing import read_spool

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    (src_dir / "a.json").write_text(
        "\n".join(json.dumps({"id": i, "v": f"x{i}"}) for i in range(5))
    )
    spool = str(tmp_path / "spool")
    run(
        spark,
        f"""
sources:
  - name: src
    module: storage
    parameters:
      format: json
      input: {src_dir}
      mode: streaming
    schema:
      fields:
        - {{name: id, type: int64}}
        - {{name: v, type: string}}
sinks:
  - name: out
    module: firestore
    inputs: [src]
    parameters:
      collection: users
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
""",
    )
    muts = read_spool(spool)
    assert sorted(m["row"]["id"] for m in muts) == [0, 1, 2, 3, 4]
    assert all(m["op"] == "UPSERT" and m["table"] == "users" for m in muts)


def test_japanese_tokenizer_and_charfilters(spark):
    """Dictionary-light Japanese segmentation (script transitions +
    okurigana attachment) plus ICU-normalize / htmlStrip charFilters.
    Reference: tokenize.md JapaneseTokenizer + NormalizeCharFilter."""
    outs = run(
        spark,
        """
sources:
  - name: texts
    module: create
    parameters:
      elements:
        - {id: 1, body: "私は東京タワーへ行った。"}
        - {id: 2, body: "<p>コーヒーを３杯飲んだ</p>"}
        - {id: 3, body: "ＡＢＣで検索する"}
    schema:
      fields:
        - {name: id, type: int64, mode: required}
        - {name: body, type: string, mode: required}
transforms:
  - name: tok
    module: tokenize
    inputs: [texts]
    parameters:
      fields:
        - name: tokens
          input: body
          charFilters:
            - {type: htmlStrip}
            - {type: normalize, normalizeName: nfkc_cf}
          tokenizer:
            type: japanese
            discardPunctuation: true
""",
    )
    rows = {r["id"]: r["tokens"] for r in outs["tok"].collect()}
    # okurigana: 行った stays one token; katakana run 東京タワー splits at
    # kanji→katakana; particles は/へ split on script class change
    assert rows[1] == ["私は", "東京", "タワー", "へ", "行った"] or rows[1] == [
        "私", "は", "東京", "タワー", "へ", "行った"
    ], rows[1]
    # html stripped, NFKC folds full-width ３ to 3; coffee keeps ー
    assert "コーヒー" in rows[2] and not any("<" in t for t in rows[2])
    assert any(t == "3" for t in rows[2]), rows[2]
    # NFKC+casefold folds full-width ＡＢＣ to abc
    assert "abc" in rows[3], rows[3]


def test_unicode_normalize_forms(spark):
    from pyspark.sql import functions as F

    from pipeline_spark.operators.tokenize import unicode_normalize

    df = spark.createDataFrame([("Ｈｅｌｌｏ　Ｗｏｒｌｄ①",)], "s string")
    out = df.select(
        unicode_normalize(F.col("s"), "nfkc").alias("nfkc"),
        unicode_normalize(F.col("s"), "nfkc_cf").alias("cf"),
    ).collect()[0]
    assert out["nfkc"] == "Hello World1"
    assert out["cf"] == "hello world1"


def test_text_template_jinja_tier(spark):
    """text select fn: plain ${field} compiles to JVM concat; templates
    with conditionals / formatting fall back to a per-row Jinja2 render
    (the engine's FreeMarker substitute, SURVEY §2.11).
    Reference: select/Text.java:94-100 + util/TemplateUtil.java."""
    outs = run(
        spark,
        """
sources:
  - name: ev
    module: create
    timestampAttribute: ts
    parameters:
      elements:
        - {id: 1, status: gold, amount: 150, ts: "2024-03-05T10:20:30Z"}
        - {id: 2, status: basic, amount: 20, ts: "2024-11-30T01:02:03Z"}
    schema:
      fields:
        - {name: id, type: int64, mode: required}
        - {name: status, type: string, mode: required}
        - {name: amount, type: int64, mode: required}
        - {name: ts, type: timestamp, mode: required}
transforms:
  - name: sel
    module: select
    inputs: [ev]
    parameters:
      select:
        - {name: id}
        - {name: simple, func: text, text: "user-${id}:${status}"}
        - name: tier
          func: text
          text: "<#if amount gt 100>vip-${status?upper_case}<#else>std</#if>"
        - name: day
          func: text
          text: "${ts?string('yyyy-MM-dd')}"
""",
    )
    rows = {r["id"]: r for r in outs["sel"].collect()}
    assert rows[1]["simple"] == "user-1:gold"
    assert rows[2]["simple"] == "user-2:basic"
    assert rows[1]["tier"] == "vip-GOLD" and rows[2]["tier"] == "std"
    assert rows[1]["day"] == "2024-03-05" and rows[2]["day"] == "2024-11-30"
    # the simple tier must stay JVM-side (no python eval in the plan)
    import re as _re

    simple_only = run(
        spark,
        """
sources:
  - name: s
    module: create
    parameters:
      elements: [{a: x, b: y}]
    schema:
      fields:
        - {name: a, type: string, mode: required}
        - {name: b, type: string, mode: required}
transforms:
  - name: sel
    module: select
    inputs: [s]
    parameters:
      select:
        - {name: joined, func: text, text: "${a}-${b}"}
""",
    )["sel"]
    plan = simple_only._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_connector_source_partitioned_read(spark):
    """SDK-backed sources read through plan_partitions/read_partition —
    distributed (one task per descriptor), schema-typed when declared.
    Reference: SpannerSource.java partitionQuery model."""
    outs = run(
        spark,
        """
sources:
  - name: sp
    module: spanner
    parameters:
      clientFactory: "pipeline_spark.testing:fake_read_client"
      instanceId: i
      databaseId: d
      table: t
      partitions: 3
    schema:
      fields:
        - {name: id, type: int64}
        - {name: name, type: string}
        - {name: score, type: int64}
transforms:
  - name: agg
    module: aggregation
    inputs: [sp]
    parameters:
      aggregations:
        - {name: n, op: count}
        - {name: total, op: sum, field: score}
""",
    )
    src = outs["sp"]
    assert src.rdd.getNumPartitions() == 3
    assert src.schema["score"].dataType.typeName() == "long"
    row = outs["agg"].collect()[0]
    assert row["n"] == 10 and row["total"] == 450


def test_connector_source_schema_inference(spark):
    """Without a declared schema, rows JSON-infer (convenience path)."""
    outs = run(
        spark,
        """
sources:
  - name: fs
    module: firestore
    parameters:
      clientFactory: "pipeline_spark.testing:fake_read_client"
      collection: users
      partitions: 2
""",
    )
    rows = outs["fs"].collect()
    assert len(rows) == 10
    assert {r["name"] for r in rows} == {f"row-{i}" for i in range(10)}


def test_connector_source_pull_once_ack_post_commit(spark, tmp_path):
    """Destructive pull sources (pubsub): the pull happens once driver-side
    even though Spark re-executes partitions (json schema inference +
    collect = at least two passes), and the ack is deferred until the run
    committed. Reference: PubSubSource.java ack-after-output semantics."""
    import json

    spool = tmp_path / "spool"
    spool.mkdir()
    outs = run(
        spark,
        f"""
sources:
  - name: ps
    module: pubsub
    parameters:
      clientFactory: "pipeline_spark.testing:fake_pull_client"
      subscription: projects/p/subscriptions/s
      spool: "{spool}"
""",
    )
    rows = outs["ps"].collect()
    assert {r["msg"] for r in rows} == {f"m-{i}" for i in range(5)}
    pulls = [json.loads(l) for l in (spool / "pulls.jsonl").read_text().splitlines()]
    assert len(pulls) == 1  # recomputation must not re-pull
    acks = [json.loads(l) for l in (spool / "acks.jsonl").read_text().splitlines()]
    assert {a["ack"] for a in acks} == {f"ack-{i}" for i in range(5)}


def test_bigquery_source_native_fallback(spark):
    """With the connector jar absent, the bigquery source routes through
    the injectable Storage-Read-style client: driver plans stream
    descriptors, one executor task per stream.  Reference:
    BigQuerySource.java:40-486 (DIRECT_READ)."""
    outs = run(
        spark,
        """
sources:
  - name: bq
    module: bigquery
    parameters:
      clientFactory: "pipeline_spark.testing:fake_read_client"
      table: "proj:ds.users"
      partitions: 4
    schema:
      fields:
        - {name: id, type: int64}
        - {name: name, type: string}
        - {name: score, type: int64}
""",
    )
    df = outs["bq"]
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 10
    assert df.schema["score"].dataType.typeName() == "long"


def test_bigquery_table_addressing():
    """project:dataset.table / dataset.table / split-ids parsing —
    BigQuerySink.Parameters.setDefaults semantics."""
    from pipeline_spark.sinks.connectors import _bq_sink_table
    from pipeline_spark.sources.connectors import _bq_table_ref

    assert _bq_table_ref({"table": "p:d.t"}) == "p.d.t"
    assert _bq_table_ref({"table": "d.t"}) == "d.t"
    assert _bq_table_ref({"projectId": "p", "datasetId": "d", "table": "t"}) == "p.d.t"
    assert _bq_sink_table({"table": "p:d.t"}) == "p.d.t"
    assert (
        _bq_sink_table({"projectId": "p", "datasetId": "d", "tableId": "t"}) == "p.d.t"
    )
    with pytest.raises(ValueError):
        _bq_sink_table({"datasetId": "d"})


def test_bigquery_sink_file_loads(spark, tmp_path):
    """FILE_LOADS without the jar: Spark stages parquet in parallel, then
    one driver-side load job points at the staged files.  The fake load
    client reads the staged parquet back, proving the files are real and
    loadable.  Reference: BigQuerySink.java method FILE_LOADS."""
    spool = str(tmp_path / "spool")
    run(
        spark,
        f"""
sources:
  - name: src
    module: create
    parameters:
      elements:
        - {{id: 1, v: a}}
        - {{id: 2, v: b}}
        - {{id: 3, v: c}}
    schema:
      fields:
        - {{name: id, type: int64, mode: required}}
        - {{name: v, type: string, mode: required}}
sinks:
  - name: out
    module: bigquery
    inputs: [src]
    parameters:
      table: "proj:ds.users"
      writeDisposition: WRITE_TRUNCATE
      clusteringFields: [v]
      clientFactory: "pipeline_spark.testing:fake_bq_load_client"
      spoolDir: {spool}
""",
    )
    from pipeline_spark.testing import read_spool

    loads = read_spool(spool)
    assert len(loads) == 1
    assert loads[0]["table"] == "proj.ds.users"
    assert loads[0]["cfg"]["writeDisposition"] == "WRITE_TRUNCATE"
    assert loads[0]["cfg"]["clusteringFields"] == ["v"]
    assert sorted(r["id"] for r in loads[0]["rows"]) == [1, 2, 3]


def test_bigquery_sink_streaming_inserts(spark, tmp_path):
    """method: STREAMING_INSERTS routes through the executor-side
    mutation-writer contract (batched insertAll shape)."""
    spool = str(tmp_path / "spool")
    run(
        spark,
        f"""
sources:
  - name: src
    module: create
    parameters:
      elements:
        - {{id: 1, v: a}}
        - {{id: 2, v: b}}
    schema:
      fields:
        - {{name: id, type: int64, mode: required}}
        - {{name: v, type: string, mode: required}}
sinks:
  - name: out
    module: bigquery
    inputs: [src]
    parameters:
      datasetId: ds
      tableId: users
      method: STREAMING_INSERTS
      clientFactory: "pipeline_spark.testing:fake_writer_client"
      spoolDir: {spool}
""",
    )
    from pipeline_spark.testing import read_spool

    muts = sorted(read_spool(spool), key=lambda m: m["row"]["id"])
    assert [m["op"] for m in muts] == ["INSERT", "INSERT"]
    assert all(m["table"] == "ds.users" for m in muts)


def test_scrape_css_selector(spark):
    """scrape css form on the stdlib selector engine: tag/.class/#id/
    [attr]/descendant/child/group selectors, text and attribute
    extraction, all-matches mode. Reference: select/Scrape.java (jsoup)."""
    html = (
        "<html><body>"
        "<div id='main'><h1 class='title big'>Hello <b>World</b></h1>"
        "<ul><li>one</li><li class='sel'>two</li></ul>"
        "<a href='/x' rel='nofollow'>link-x</a>"
        "<a href='/y'>link-y</a></div>"
        "<div class='footer'><p>bye</p></div>"
        "</body></html>"
    )
    esc = html.replace('"', '\\"')
    outs = run(
        spark,
        f"""
sources:
  - name: pages
    module: create
    parameters:
      elements:
        - {{id: 1, html: "{esc}"}}
    schema:
      fields:
        - {{name: id, type: int64, mode: required}}
        - {{name: html, type: string, mode: required}}
transforms:
  - name: sel
    module: select
    inputs: [pages]
    parameters:
      select:
        - {{name: id}}
        - {{name: title, func: scrape, field: html, selector: "#main h1.title"}}
        - {{name: second_li, func: scrape, field: html, selector: "ul > li.sel"}}
        - {{name: nofollow_href, func: scrape, field: html, selector: "a[rel=nofollow]", attribute: href}}
        - {{name: all_links, func: scrape, field: html, selector: "a", attribute: href, all: true}}
        - {{name: grouped, func: scrape, field: html, selector: "h1, p"}}
        - {{name: regex_b, func: scrape, field: html, pattern: "<b>([^<]+)</b>"}}
""",
    )
    r = outs["sel"].collect()[0]
    assert r["title"] == "Hello World"
    assert r["second_li"] == "two"
    assert r["nofollow_href"] == "/x"
    assert list(r["all_links"]) == ["/x", "/y"]
    assert r["grouped"] == "Hello World"
    assert r["regex_b"] == "World"


def test_scrape_bad_selector_fails_at_plan_time(spark):
    with pytest.raises(Exception, match="unsupported CSS"):
        run(
            spark,
            """
sources:
  - name: pages
    module: create
    parameters:
      elements: [{html: "<p>x</p>"}]
    schema:
      fields:
        - {name: html, type: string, mode: required}
transforms:
  - name: sel
    module: select
    inputs: [pages]
    parameters:
      select:
        - {name: t, func: scrape, field: html, selector: "p:nth-child(2)"}
""",
        )


def test_reshuffle_partition_count_and_content(spark):
    """reshuffle: explicit repartition to numShards (optionally keyed)
    preserves rows. Reference: ReshuffleTransform.java:8-29."""
    outs = run(
        spark,
        BASE
        + """
transforms:
  - name: rs
    module: reshuffle
    inputs: [create1]
    parameters:
      numShards: 5
  - name: rsk
    module: reshuffle
    inputs: [create1]
    parameters:
      numShards: 3
      fields: [stringField]
""",
    )
    assert outs["rs"].rdd.getNumPartitions() == 5
    assert sorted(r["intField"] for r in outs["rs"].collect()) == [1, 2, 3, 4, 5, 6]
    assert outs["rsk"].rdd.getNumPartitions() == 3
    # keyed repartition co-locates each key in one partition
    per_part = outs["rsk"].rdd.mapPartitions(
        lambda rows: [set(r["stringField"] for r in rows)]
    ).collect()
    seen = {}
    for i, keys in enumerate(per_part):
        for k in keys:
            assert k not in seen, f"key {k} split across partitions"
            seen[k] = i


def test_aggregation_any_op(spark):
    """any → any_value: one of the group's values (deterministic check:
    value must belong to the group)."""
    outs = run(
        spark,
        BASE
        + """
transforms:
  - name: agg
    module: aggregation
    inputs: [create1]
    parameters:
      groupFields: [stringField]
      aggregations:
        - {name: any_i, op: any, field: intField}
        - {name: cnt, op: count}
""",
    )
    groups = {"a": {1, 2, 3}, "b": {4, 5}, "c": {6}}
    for r in outs["agg"].collect():
        assert r["any_i"] in groups[r["stringField"]]


def _zz(n: int) -> bytes:
    """Avro zigzag varint, written out per the spec for test fixtures."""
    u = (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_deserialize_avro_pure_python_fallback(spark):
    """Avro binary decode without the spark-avro jar: hand-crafted datum
    per the public spec (zigzag ints, len-prefixed strings, LE doubles,
    block arrays, union index, enum index) decodes into a typed struct.
    Spec vectors sanity-check the fixture encoder itself."""
    import struct

    from pyspark.sql import Row

    # spec examples: 1 → 0x02, -1 → 0x01, 64 → 0x80 0x01
    assert _zz(1) == b"\x02" and _zz(-1) == b"\x01" and _zz(64) == b"\x80\x01"

    schema = {
        "type": "record", "name": "Ev", "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "note", "type": ["null", "string"]},
            {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
        ],
    }

    def datum(id_, name, score, tags, note, kind_idx):
        b = _zz(id_)
        b += _zz(len(name)) + name.encode()
        b += struct.pack("<d", score)
        if tags:
            b += _zz(len(tags))
            for t in tags:
                b += _zz(len(t)) + t.encode()
        b += _zz(0)  # array end block
        if note is None:
            b += _zz(0)
        else:
            b += _zz(1) + _zz(len(note)) + note.encode()
        b += _zz(kind_idx)
        return b

    rows = [
        Row(k=1, payload=bytearray(datum(3, "ab", 1.5, ["x", "yz"], None, 0))),
        Row(k=2, payload=bytearray(datum(-7, "", 0.25, [], "hi", 1))),
        Row(k=3, payload=bytearray(b"\x00\x00\x00\x00\x2a" + datum(64, "c", 2.0, ["q"], None, 1))),  # confluent-framed
    ]
    import json as _json

    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    df = spark.createDataFrame(rows, "k long, payload binary")
    outs = run_pipeline(
        spark,
        parse_config(f"""
transforms:
  - name: parsed
    module: deserialize
    inputs: [raw]
    parameters:
      field: payload
      format: avro
      avroSchema: '{_json.dumps(schema)}'
"""),
        inputs={"raw": df},
    )
    got = {r["id"]: r for r in outs["parsed"].collect()}
    assert got[3]["name"] == "ab" and got[3]["score"] == 1.5
    assert list(got[3]["tags"]) == ["x", "yz"] and got[3]["note"] is None
    assert got[3]["kind"] == "A"
    assert got[-7]["name"] == "" and got[-7]["note"] == "hi" and got[-7]["kind"] == "B"
    assert got[64]["name"] == "c" and list(got[64]["tags"]) == ["q"]  # framed payload


def test_deserialize_avro_all_null_record_not_dead_lettered(spark):
    """A legitimately all-null record (every [null,T] union branch absent)
    must stay on the main output; only actual decode failures route to the
    dead letter, carried with an explicit error message."""
    import json as _json

    from pyspark.sql import Row

    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    schema = {
        "type": "record", "name": "N", "fields": [
            {"name": "a", "type": ["null", "string"]},
            {"name": "b", "type": ["null", "long"]},
        ],
    }
    all_null = _zz(0) + _zz(0)  # both union branches -> null
    good = _zz(1) + _zz(2) + b"hi" + _zz(1) + _zz(5)
    bad = _zz(1) + _zz(99)  # claims 99-byte string, truncated
    df = spark.createDataFrame(
        [Row(k=1, payload=bytearray(all_null)),
         Row(k=2, payload=bytearray(good)),
         Row(k=3, payload=bytearray(bad))],
        "k long, payload binary",
    )
    outs = run_pipeline(
        spark,
        parse_config(f"""
transforms:
  - name: parsed
    module: deserialize
    inputs: [raw]
    failFast: false
    parameters:
      field: payload
      format: avro
      avroSchema: '{_json.dumps(schema)}'
"""),
        inputs={"raw": df},
    )
    main = {r["k"]: r for r in outs["parsed"].collect()}
    assert set(main) == {1, 2}
    assert main[1]["a"] is None and main[1]["b"] is None
    assert main[2]["a"] == "hi" and main[2]["b"] == 5
    assert "__deserialize_error__" not in outs["parsed"].columns
    failures = outs["parsed.failures"].collect()
    assert [r["k"] for r in failures] == [3] and failures[0]["error"]


def test_bpe_tokenizer_merge_order_and_eow(spark):
    from pipeline_spark.operators.tokenize import bpe_ranks, bpe_tokens_udf
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("lower lowest",), ("abc",), ("",)], "text: string"
    )
    # classic Sennrich example: learn "lo", "low", "er</w>"
    ranks = bpe_ranks(
        {"merges": ["l o", "lo w", "e r</w>", "b c"]}
    )
    out = df.select(bpe_tokens_udf(ranks, "</w>")(F.col("text")).alias("t")).collect()
    assert out[0]["t"] == ["low", "er</w>", "low", "e", "s", "t</w>"]
    # merge priority: "b c" ranks below nothing else for 'abc' with eow
    # on c; pair (b, c</w>) is NOT the learned ("b","c") merge → no merge
    assert out[1]["t"] == ["a", "b", "c</w>"]
    assert out[2]["t"] == []

    # without end-of-word marker the plain ("b","c") merge applies, and
    # rank order decides between overlapping candidates
    ranks2 = bpe_ranks({"merges": ["b c", "a b"]})
    out2 = df.select(bpe_tokens_udf(ranks2, "")(F.col("text")).alias("t")).collect()
    assert out2[1]["t"] == ["a", "bc"]  # bc ranks first, ab never applies


def test_bpe_through_tokenize_module(spark, tmp_path):
    from pipeline_spark.config import parse_config
    from pipeline_spark.executor import run_pipeline

    merges = tmp_path / "merges.txt"
    merges.write_text("#version: 0.2\nt h\nth e\n")
    cfg = parse_config(f"""
sources:
  - name: docs
    module: create
    parameters:
      elements:
        - {{id: 1, text: "the theme"}}
    schema:
      fields:
        - {{name: id, type: int64}}
        - {{name: text, type: string}}
transforms:
  - name: tok
    module: tokenize
    inputs: [docs]
    parameters:
      fields:
        - field: text
          name: toks
          tokenizer: {{type: bpe, mergesFile: {merges}}}
""")
    out = run_pipeline(spark, cfg)["tok"]
    row = out.collect()[0]
    assert row["toks"] == ["the", "the", "m", "e"]


def test_japanese_user_dictionary(spark, tmp_path):
    """userDictionary hook (tokenize.md:36, kuromoji user-dict CSV):
    compound words segment per the dictionary entry — results only
    achievable with the dictionary loaded."""
    from pipeline_spark.operators.tokenize import JaUserDict, segment_japanese_text

    # without a dictionary: one kanji run / split at script boundary
    assert segment_japanese_text("関西国際空港") == ["関西国際空港"]
    assert segment_japanese_text("スパークSQLを使う") == ["スパーク", "SQL", "を", "使う"]

    ud = JaUserDict.parse([
        "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,カスタム名詞",
        "スパークSQL",  # bare surface: keep as one token
        "# comment line ignored",
    ])
    # dictionary entry splits the compound per its segmentation field
    assert segment_japanese_text("関西国際空港", user_dict=ud) == ["関西", "国際", "空港"]
    # bare-surface entry overrides the script-boundary split
    assert segment_japanese_text("スパークSQLを使う", user_dict=ud) == [
        "スパークSQL", "を", "使う"
    ]
    # longest match wins over a shorter overlapping entry
    ud2 = JaUserDict.parse(["東京", "東京タワー,東京 タワー"])
    assert segment_japanese_text("東京タワーに登る", user_dict=ud2) == [
        "東京", "タワー", "に", "登る"
    ]

    # module surface: userDictionary file via YAML config
    dict_file = tmp_path / "user.dic"
    dict_file.write_text("関西国際空港,関西 国際 空港,,名詞\n", encoding="utf-8")
    outs = run(
        spark,
        f"""
sources:
  - name: texts
    module: create
    parameters:
      elements:
        - {{id: 1, body: "関西国際空港へ行く"}}
    schema:
      fields:
        - {{name: id, type: int64, mode: required}}
        - {{name: body, type: string, mode: required}}
transforms:
  - name: tok
    module: tokenize
    inputs: [texts]
    parameters:
      fields:
        - name: tokens
          input: body
          tokenizer:
            type: japanese
            discardPunctuation: true
            userDictionary: {dict_file}
""",
    )
    rows = outs["tok"].collect()
    assert rows[0]["tokens"][:3] == ["関西", "国際", "空港"], rows[0]["tokens"]


def test_storage_bucketed_write_colocated_join(spark, tmp_path):
    """bucketBy storage writes (Spark-idiomatic scale feature beyond the
    reference's Beam surface): two tables bucketed on the join key read
    back from the catalog and join WITHOUT a shuffle exchange — the
    shuffle is paid once at write time, not per query."""
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lines")
    for name, rows, schema in [
        ("bt_orders", [(i, f"o{i}") for i in range(100)], "k long, v string"),
        ("bt_lines", [(i % 100, i * 10) for i in range(300)], "k long, amt long"),
    ]:
        df = spark.createDataFrame(rows, schema)
        run_pipeline(
            spark,
            parse_config(f"""
sinks:
  - name: out
    module: storage
    inputs: [src]
    parameters:
      format: parquet
      output: {tmp_path}/{name}
      table: {name}
      bucketBy: {{numBuckets: 4, fields: [k], sortBy: [k]}}
"""),
            inputs={"src": df},
        )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force a non-broadcast join so the plan shows the bucketing payoff
    # (at real scale both sides are too big to broadcast anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        outs = run(
            spark,
            """
sources:
  - name: o
    module: storage
    parameters: {table: bt_orders}
  - name: l
    module: storage
    parameters: {table: bt_lines}
transforms:
  - name: joined
    module: beamsql
    inputs: [o, l]
    parameters:
      sql: "SELECT o.k, o.v, l.amt FROM o JOIN l ON o.k = l.k"
""",
        )
        joined = outs["joined"]
        assert joined.count() == 300
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join must not shuffle:\n{plan}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lines")


def test_example_transform_passthrough(spark, capsys):
    """example module: union inputs, print a bounded head driver-side,
    pass rows through unchanged.  Reference: ExampleTransform.java:13-40."""
    outs = run(
        spark,
        BASE
        + """
transforms:
  - name: demo
    module: example
    inputs: [create1]
    parameters: {numRows: 2}
""",
    )
    assert outs["demo"].count() == 6
    captured = capsys.readouterr().out
    assert "debug [demo]" in captured


def test_text_sink_per_record_templated_files(spark, tmp_path):
    """text sink: each record renders the FreeMarker template into its
    own file at a per-record templated destination; _CSVPrinter helper
    and <#if> directives work.  Reference: TextSink.java:43-270 +
    docs/config/module/sink/text.md."""
    out = tmp_path / "docs"
    run(
        spark,
        BASE
        + f"""
sinks:
  - name: txt
    module: text
    inputs: [create1]
    parameters:
      output: "{out}/${{stringField}}-${{intField}}.txt"
      template: |
        id=${{intField}} group=${{stringField}}<#if boolField> FLAGGED</#if>
        ${{_CSVPrinter.line(stringField, intField)}}
""",
    )
    files = sorted(f.name for f in out.iterdir())
    assert files == [f"{s}-{i}.txt" for s, i in
                     [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("c", 6)]]
    one = (out / "a-1.txt").read_text()
    assert "id=1 group=a FLAGGED" in one
    assert "a,1" in one
    two = (out / "b-4.txt").read_text()
    assert "FLAGGED" not in two


def test_sentence_tokenizer_and_opennlp_standin(spark):
    """Rule-based sentence detection (the OpenNLP sentence-model
    stand-in, TokenAnalyzer.java:160-172): abbreviations, initials,
    decimals, CJK terminators, quote-aware continuation; the opennlp
    tokenizer type emits sentence-aware word tokens."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from pipeline_spark.operators.tokenize import split_sentences, tokenize_column

    assert split_sentences(
        "Dr. Smith went to Washington. He arrived at 3 p.m. yesterday."
    ) == ["Dr. Smith went to Washington.", "He arrived at 3 p.m. yesterday."]
    assert split_sentences("J. R. Tolkien wrote. It sold 3.5 million.") == [
        "J. R. Tolkien wrote.", "It sold 3.5 million."
    ]
    assert split_sentences("これは文です。これも文です！") == [
        "これは文です。", "これも文です！"
    ]
    assert split_sentences('He said "Stop!" Then. "Why?" she asked.') == [
        'He said "Stop!"', 'Then.', '"Why?" she asked.'
    ]

    df = spark.createDataFrame([Row(t="A b. C d! E?")])
    sents = df.select(
        tokenize_column(F.col("t"), {"type": "sentence"}, []).alias("s")
    ).collect()[0]["s"]
    assert sents == ["A b.", "C d!", "E?"]
    words = df.select(
        tokenize_column(F.col("t"), {"type": "opennlp"}, []).alias("w")
    ).collect()[0]["w"]
    assert words == ["A", "b", "C", "d", "E"]


def test_storage_orc_roundtrip_and_streaming(spark, tmp_path):
    """ORC through the storage source/sink: batch write+read with
    compression, and the file-stream source on the same directory."""
    from pyspark.sql import Row

    from pipeline_spark.registry import ModuleContext
    from pipeline_spark.sinks.storage import storage_sink
    from pipeline_spark.sources.storage import storage_source

    out = str(tmp_path / "orc_out")
    df = spark.createDataFrame([Row(a=i, b=f"s{i}") for i in range(50)])
    storage_sink(
        ModuleContext(
            spark=spark, name="w",
            params={"format": "orc", "output": out, "compression": "zstd"},
            inputs=[df], input_names=["in"], side_inputs={},
        )
    )
    back = storage_source(
        ModuleContext(
            spark=spark, name="r", params={"format": "orc", "input": out},
            inputs=[], input_names=[], side_inputs={},
        )
    )[""]
    assert sorted(r["a"] for r in back.collect()) == list(range(50))
    stream = storage_source(
        ModuleContext(
            spark=spark, name="s",
            params={"format": "orc", "input": out, "mode": "streaming"},
            inputs=[], input_names=[], side_inputs={},
        )
    )[""]
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("orc_stream")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT count(*) c FROM orc_stream").first()["c"] == 50


def test_aggregation_rollup_cube_pivot_params(spark):
    from pyspark.sql import Row

    from pipeline_spark.operators.aggregation import aggregation_transform
    from pipeline_spark.registry import ModuleContext

    df = spark.createDataFrame(
        [Row(a="x", b="p", v=1), Row(a="x", b="q", v=2), Row(a="y", b="p", v=4)]
    )

    def run(params):
        return aggregation_transform(
            ModuleContext(spark=spark, name="a", params=params,
                          inputs=[df], input_names=["in"])
        )[""]

    cube = run({"groupFields": ["a", "b"], "groupType": "cube",
                "aggregations": [{"name": "s", "op": "sum", "field": "v"}]})
    rows = {(r["a"], r["b"]): r["s"] for r in cube.collect()}
    # 3 detail + 2 a-subtotals + 2 b-subtotals + 1 grand total
    assert len(rows) == 8
    assert rows[(None, None)] == 7 and rows[("x", None)] == 3
    assert rows[(None, "p")] == 5

    piv = run({"groupFields": ["a"],
               "pivot": {"field": "b", "values": ["p", "q"]},
               "aggregations": [{"name": "s", "op": "sum", "field": "v"}]})
    got = {r["a"]: (r["p"], r["q"]) for r in piv.collect()}
    # absent combination (y, q) is NULL, not 0
    assert got == {"x": (1, 2), "y": (4, None)}

    import pytest as _pt

    with _pt.raises(ValueError, match="groupType"):
        run({"groupFields": ["a"], "groupType": "nope",
             "aggregations": [{"name": "n", "op": "count"}]})
    with _pt.raises(ValueError, match="pivot requires"):
        run({"groupFields": ["a"], "groupType": "cube",
             "pivot": {"field": "b"},
             "aggregations": [{"name": "n", "op": "count"}]})


def test_parquet_bloom_filter_columns(spark, tmp_path):
    """r7: bloomFilterColumns plumbs parquet-mr bloom filter writer
    properties through the storage / iceberg / delta sinks — row-group
    point-lookup skipping for high-cardinality keys whose min/max bounds
    can't prune.  pyarrow 16 doesn't expose bloom offsets, so the
    assertion is the deterministic size delta (parquet-mr appends the
    bloom bitset, default 1 MiB cap, after the data pages)."""
    import glob
    import os

    from pipeline_spark.sinks.delta_native import write_delta_native
    from pipeline_spark.sinks.iceberg_native import write_iceberg_native

    df = spark.range(100_000).selectExpr(
        "id", "cast(id as string) AS k"
    ).coalesce(1)

    def _one_file_size(pattern):
        fs = glob.glob(pattern, recursive=True)
        assert len(fs) >= 1, pattern
        return sum(os.path.getsize(f) for f in fs)

    plain = str(tmp_path / "plain")
    df.write.parquet(plain)
    base = _one_file_size(os.path.join(plain, "*.parquet"))

    src = str(tmp_path / "src")
    df.write.parquet(src)
    out = str(tmp_path / "bloomed")
    run_pipeline(spark, parse_config(f"""
sources:
  - name: rows
    module: storage
    parameters: {{format: parquet, input: {src}}}
sinks:
  - name: w
    module: storage
    inputs: [rows]
    parameters:
      format: parquet
      output: {out}
      bloomFilterColumns: [k]
"""))
    assert _one_file_size(os.path.join(out, "**", "*.parquet")) > base + 500_000

    ice = str(tmp_path / "ice_bloom")
    write_iceberg_native(
        df, {"path": ice, "mode": "create", "bloomFilterColumns": ["k"]})
    assert _one_file_size(
        os.path.join(ice, "data", "**", "*.parquet")) > base + 500_000

    dl = str(tmp_path / "delta_bloom")
    write_delta_native(
        spark, df, {"path": dl, "bloomFilterColumns": ["k"]})
    assert _one_file_size(
        os.path.join(dl, "data-*", "**", "*.parquet")) > base + 500_000
