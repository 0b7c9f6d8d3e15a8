"""LLM-judge RAG evaluation (R8): faithfulness / relevancy /
context-precision scores per row.

Reference (ondine/knowledge/eval.py:24-125; stage hook
ondine/stages/knowledge_retrieval_stage.py:98-146): after retrieval +
generation, a judge LLM scores each (question, context, answer) triple on
three 0-1 dimensions.

Spark-first: one Arrow-batched invoke over the result frame per dimension
(reusing the engine's own invoke_llm — retries/rate limits apply to judge
calls too), scores parsed with a tolerant float extractor. Deterministic
under a mock judge client.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ondine_spark.core.specs import LLMSpec, ProcessingSpec
from ondine_spark.llm.invoke import invoke_llm

JUDGE_PROMPTS = {
    "_kb_eval_faithfulness": (
        "Rate 0.0-1.0 how faithful the ANSWER is to the CONTEXT (1.0 = every "
        "claim supported). Reply with only the number.\n\nCONTEXT:\n{context}"
        "\n\nANSWER:\n{answer}"
    ),
    "_kb_eval_relevancy": (
        "Rate 0.0-1.0 how relevant the ANSWER is to the QUESTION. Reply with "
        "only the number.\n\nQUESTION:\n{question}\n\nANSWER:\n{answer}"
    ),
    "_kb_eval_context_precision": (
        "Rate 0.0-1.0 how much of the CONTEXT is relevant to the QUESTION. "
        "Reply with only the number.\n\nQUESTION:\n{question}\n\nCONTEXT:\n"
        "{context}"
    ),
}


def judge_scores(
    df: DataFrame,
    judge_factory,
    question_col: str,
    answer_col: str,
    context_col: str = "_kb_context",
    metrics: list[str] | None = None,
    concurrency: int = 8,
) -> DataFrame:
    """Append the requested ``_kb_eval_*`` score columns (double, 0-1;
    null when the judge reply has no parseable number)."""
    metrics = metrics or list(JUDGE_PROMPTS)
    llm = LLMSpec(model="judge", client_factory=judge_factory)
    proc = ProcessingSpec(concurrency=concurrency)
    for metric in metrics:
        template = JUDGE_PROMPTS[metric]
        prompt = template.replace("{question}", "%s").replace(
            "{context}", "%s"
        ).replace("{answer}", "%s")
        args = []
        for token in ("question", "context", "answer"):
            if "{" + token + "}" in template:
                col = {"question": question_col, "context": context_col,
                       "answer": answer_col}[token]
                args.append(F.coalesce(F.col(col).cast("string"), F.lit("")))
        df = df.withColumn("prompt", F.format_string(prompt, *args))
        judged = invoke_llm(df, llm, proc)
        score = F.regexp_extract(
            F.col("response_text"), r"(\d+(?:\.\d+)?)", 1
        )
        df = judged.withColumn(
            metric,
            F.when(
                score != "",
                F.least(F.greatest(score.cast("double"), F.lit(0.0)), F.lit(1.0)),
            ),
        ).drop("prompt", "response_text", "tokens_in", "tokens_out",
               "resp_model", "cost", "latency_ms", "error")
    return df
