"""Structured output (L3/F7), custom parser/stage hooks (U1/U2),
adaptive concurrency (O5)."""

import sys

import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

from ondine_spark import PipelineBuilder

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def json_factory():
    class C:
        def complete(self, prompt, system=None):
            from ondine_spark.llm.client import LLMResult

            if "bad" in prompt:
                text = "this is not json at all"
            elif "fence" in prompt:
                text = '```json\n{"label": "f", "score": 2.5}\n```'
            else:
                text = '{"label": "ok", "score": 1.5}'
            return LLMResult(text=text, tokens_in=2, tokens_out=2,
                            model="m", cost="0", latency_ms=0.1)

    return C()


def _run(spark, schema):
    df = spark.createDataFrame(
        [("a", "good input"), ("b", "bad input"), ("c", "fence input")],
        ["id", "txt"],
    )
    return (
        PipelineBuilder(spark)
        .from_dataframe(df, ["txt"], id_column="id")
        .with_prompt("Do: {txt}", ["label", "score"])
        .with_structured_output(schema)
        .with_custom_llm_client(json_factory)
        .build()
        .result_frame()
        .collect()
    )


@pytest.mark.parametrize("schema", [
    "label STRING, score DOUBLE",
    {"label": "string", "score": "double"},
])
def test_structured_output_validates(spark, schema):
    rows = {r["id"]: r for r in _run(spark, schema)}
    assert rows["a"]["label"] == "ok" and rows["a"]["score"] == 1.5
    assert rows["a"]["_parse_error"] is False
    # markdown fences stripped
    assert rows["c"]["label"] == "f" and rows["c"]["score"] == 2.5
    # invalid json -> nulls + parse error flag
    assert rows["b"]["label"] is None
    assert rows["b"]["_parse_error"] is True


def test_structured_output_rejects_missing_column(spark):
    with pytest.raises(ValueError, match="not in output_schema"):
        _run(spark, "label STRING")


def test_custom_parser_and_stages(spark):
    def shout_factory():
        class C:
            def complete(self, prompt, system=None):
                from ondine_spark.llm.client import LLMResult

                return LLMResult(text=prompt[-3:], tokens_in=1, tokens_out=1,
                                model="m", cost="0", latency_ms=0.1)

        return C()

    def my_parser(responses, out_cols):
        return responses.withColumn(out_cols[0], F.upper("response_text"))

    df = spark.createDataFrame([("a", "xyz")], ["id", "txt"])
    p = (
        PipelineBuilder(spark)
        .from_dataframe(df, ["txt"], id_column="id")
        .with_prompt("{txt}", ["out"])
        .with_custom_llm_client(shout_factory)
        .with_custom_parser(my_parser)
        .with_stage(lambda d: d.withColumn("txt", F.concat(F.col("txt"), F.lit("!"))),
                    position="after_load")
        .with_stage(lambda d: d.withColumn("staged", F.lit(True)),
                    position="after_parse")
        .build()
    )
    row = p.result_frame().collect()[0]
    # after_load stage mutated the input before prompting: "xyz!"[-3:]="yz!"
    assert row["out"] == "YZ!"
    assert row["staged"] is True


def test_adaptive_concurrency_shrinks_and_completes(spark):
    def flaky_factory():
        class C:
            def __init__(self):
                self.n = 0

            def complete(self, prompt, system=None):
                from ondine_spark.llm.client import (
                    LLMResult,
                    TransientLLMError,
                )

                self.n += 1
                if self.n % 7 == 0:
                    raise TransientLLMError("429", retry_after=0.001)
                return LLMResult(text="ok", tokens_in=1, tokens_out=1,
                                model="m", cost="0", latency_ms=0.1)

        return C()

    df = spark.createDataFrame([(str(i), f"t{i}") for i in range(60)], ["id", "txt"])
    p = (
        PipelineBuilder(spark)
        .from_dataframe(df, ["txt"], id_column="id")
        .with_prompt("{txt}", ["out"])
        .with_custom_llm_client(flaky_factory)
        .with_adaptive_concurrency()
        .with_max_retries(3)
        .build()
    )
    rows = p.result_frame().collect()
    assert len(rows) == 60
    assert all(r["out"] == "ok" for r in rows)


def test_adaptive_limiter_unit():
    from ondine_spark.llm.invoke import AdaptiveLimiter

    lim = AdaptiveLimiter(16)
    start = lim.limit
    lim.acquire()
    lim.release(0.1, throttled=True)
    assert lim.limit < start  # multiplicative shrink
    shrunk = lim.limit
    lim.last_shrink = 0.0  # bypass cooldown
    lim.acquire()
    lim.release(0.1, throttled=True)
    assert lim.limit < shrunk
    # growth toward max only when SATURATED at near-baseline latency
    for _ in range(50):
        k = int(lim.limit)
        for _ in range(k):
            lim.acquire()
        for _ in range(k):
            lim.release(0.05, throttled=False)
    assert lim.limit > shrunk
    # and an unsaturated workload must NOT grow the cap
    before = lim.limit
    for _ in range(20):
        lim.acquire()
        lim.release(0.05, throttled=False)
    assert lim.limit == before
