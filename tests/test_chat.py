"""operators/chat.py: validation flags and template rendering over
hand-built conversations covering every flag combination."""

from pyspark.sql import functions as F

from gdelt_extractor_spark.operators.chat import (
    chat_report,
    chat_valid_flags,
    render_chat,
)

SCHEMA = (
    "doc_id long, "
    "chat array<struct<role: string, content: string>>"
)


def _report(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["doc_id"]: r.asDict()
        for r in chat_report(df, "chat", "doc_id").collect()
    }


def test_valid_conversation(spark):
    out = _report(
        spark,
        [
            (1, [("user", "hi"), ("assistant", "hello")]),
            (2, [("system", "be kind"), ("user", "hi"),
                 ("assistant", "hello")]),
        ],
    )
    for d in (1, 2):
        assert out[d]["valid"], out[d]
        assert out[d]["starts_ok"] and out[d]["alternates"]
        assert out[d]["no_empty"] and out[d]["ends_assistant"]
    assert out[1]["n_turns"] == 2 and out[1]["n_body_turns"] == 2
    assert out[2]["n_turns"] == 3 and out[2]["n_body_turns"] == 2


def test_each_violation(spark):
    out = _report(
        spark,
        [
            # starts with assistant
            (1, [("assistant", "hi"), ("user", "yo")]),
            # double user
            (2, [("user", "a"), ("user", "b"), ("assistant", "c")]),
            # empty content
            (3, [("user", "a"), ("assistant", "  ")]),
            # ends with user
            (4, [("user", "a"), ("assistant", "b"), ("user", "c")]),
            # system only (no body)
            (5, [("system", "s")]),
            # empty conversation
            (6, []),
        ],
    )
    assert not out[1]["starts_ok"] and not out[1]["valid"]
    assert not out[2]["alternates"] and not out[2]["valid"]
    assert not out[3]["no_empty"] and out[3]["alternates"]
    assert not out[4]["ends_assistant"] and out[4]["alternates"]
    assert not out[5]["alternates"] and not out[5]["valid"]
    assert not out[6]["starts_ok"] and not out[6]["valid"]
    # null content counts as empty
    outn = _report(spark, [(7, [("user", None), ("assistant", "x")])])
    assert not outn[7]["no_empty"]


def test_render_template(spark):
    df = spark.createDataFrame(
        [(1, [("user", "hi"), ("assistant", "yo")])], SCHEMA
    )
    s = df.select(render_chat(F.col("chat")).alias("r")).first()["r"]
    assert s == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nyo<|im_end|>"
    )


def test_flags_struct_is_projection_only(spark):
    df = spark.createDataFrame(
        [(1, [("user", "hi"), ("assistant", "yo")])], SCHEMA
    )
    plan = (
        df.select(chat_valid_flags(F.col("chat")).alias("f"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
