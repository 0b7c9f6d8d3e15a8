"""End-to-end: KB retrieval + verification stages inside the pipeline plan
(reference lifecycle: ondine/api/pipeline.py:694-751,873-893,929-1107)."""

import sys

from pyspark import cloudpickle
import pytest
from pyspark.sql import functions as F

from ondine_spark import PipelineBuilder
from ondine_spark.knowledge import KnowledgeStore

# test modules aren't importable on executors — ship closures by value
cloudpickle.register_pickle_by_value(sys.modules[__name__])


def echo_context_factory():
    """Deterministic client: answers with the first context line if present
    (so grounding against the KB context scores high), else a fixed
    hallucination. Defined inside a factory so cloudpickle ships it by
    value (test modules aren't importable on executors)."""

    class EchoContextClient:
        def complete(self, prompt, system=None):
            from ondine_spark.llm.client import LLMResult

            text = "unsupported hallucinated claim xyz"
            if prompt.startswith("Context:\n"):
                text = prompt.split("\n")[1]
            return LLMResult(
                text=text, tokens_in=len(prompt.split()), tokens_out=5,
                model="echo-ctx", cost="0.000001", latency_ms=0.5,
            )

    return EchoContextClient()


@pytest.fixture(scope="module")
def kb(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (1, "Paris is the capital of France. It lies on the Seine."),
            (2, "Madrid is the capital of Spain. It is a large city."),
            (3, "Berlin is the capital of Germany. It has many museums."),
        ],
        ["doc_id", "text"],
    )
    store = KnowledgeStore(spark, str(tmp_path_factory.mktemp("kb_e2e")))
    store.ingest(docs, "doc_id", "text", max_tokens=64)
    return store


def test_kb_pipeline_grounded_answers(spark, kb, tmp_path):
    rows = spark.createDataFrame(
        [
            ("q1", "capital of France"),
            ("q2", "capital of Spain"),
            ("q3", "zz qq completely unmatched tokens"),
        ],
        ["qid", "question"],
    )
    p = (
        PipelineBuilder(spark)
        .from_dataframe(rows, ["question"], id_column="qid")
        .with_prompt("Answer: {question}", ["answer"])
        .with_custom_llm_client(echo_context_factory)
        .with_knowledge_base(kb.path, ["question"], top_k=1, min_score=0.3)
        .with_grounding(threshold=0.2)
        .with_confidence_scoring()
        .build()
    )
    res = p.execute()
    got = {r["qid"]: r for r in res.data.collect()}
    assert "paris" in got["q1"]["answer"].lower()
    assert "madrid" in got["q2"]["answer"].lower()
    assert got["q1"]["_grounded"] is True
    assert got["q1"]["_grounding_score"] > 0.5
    # unmatched query gets no context → hallucinated answer → ungrounded
    assert got["q3"]["answer"] == "unsupported hallucinated claim xyz"
    assert got["q3"]["_grounded"] is False
    assert got["q1"]["_confidence_score"] > got["q3"]["_confidence_score"]


def test_contradiction_in_pipeline(spark):
    def fixed_factory():
        class FixedClient:
            def complete(self, prompt, system=None):
                from ondine_spark.llm.client import LLMResult

                val = "42" if "alpha one" in prompt else "7"
                return LLMResult(text=val, tokens_in=3, tokens_out=1,
                                model="fixed", cost="0", latency_ms=0.1)

        return FixedClient()

    spark_df = spark.createDataFrame(
        [("a", "alpha one"), ("b", "alpha two"), ("c", "beta one")],
        ["k", "item"],
    )
    p = (
        PipelineBuilder(spark)
        .from_dataframe(spark_df, ["item"], id_column="k")
        .with_prompt("Value of {item}?", ["value"])
        .with_custom_llm_client(fixed_factory)
        .with_contradiction_detection(["grp"], ["value"])
        .build()
    )
    # add the grouping column through a pre-transform: group = first word
    df = p.input_frame().withColumn("grp", F.split(F.col("item"), " ")[0])
    out = p.result_frame(df).collect()
    got = {r["k"]: r["_contradiction"] for r in out}
    assert got == {"a": True, "b": True, "c": False}
