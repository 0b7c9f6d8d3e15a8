"""RAG + anti-hallucination: KB retrieval, grounding, confidence
(reference: knowledge-base and context-store features).

Ingest documents into a knowledge store (BM25 + dense inverted indexes),
retrieve top-k context per row as ONE inverted-index join (never a
per-row store call), prepend it to prompts, and score the outputs'
grounding against the retrieved context.
"""

import tempfile

from _session import session

from ondine_spark import PipelineBuilder, mock_client_factory
from ondine_spark.knowledge import KnowledgeStore

spark = session()

kb_dir = tempfile.mkdtemp(prefix="ondine_kb_")
corpus = spark.createDataFrame(
    [
        ("d1", "The Eiffel Tower is located in Paris, France."),
        ("d2", "The Great Wall of China is visible across northern China."),
        ("d3", "Spark executes DataFrame plans through the Catalyst optimizer."),
    ],
    "doc_id string, text string",
)
store = KnowledgeStore(spark, kb_dir)
store.ingest(corpus, "doc_id", "text", max_tokens=64)

questions = spark.createDataFrame(
    [("q1", "Where is the Eiffel Tower?"),
     ("q2", "What optimizer does Spark use?")],
    "id string, question string",
)

result = (
    PipelineBuilder(spark)
    .from_dataframe(questions, ["question"], id_column="id")
    # method="auto" (the default) routes retrieval to the banded-LSH
    # candidate path above 100K chunks; tiny corpora like this one use
    # the exact inverted-index join. Force either with method="exact" /
    # method="lsh".
    .with_knowledge_base(kb_dir, ["question"], top_k=2, method="auto")
    .with_prompt("Answer from the context only: {question}", ["answer"])
    .with_grounding(threshold=0.05, on_fail="flag")
    .with_custom_llm_client(mock_client_factory())
    .build()
    .execute()
)
result.data.show(truncate=40)

print("hybrid search (BM25 + dense, RRF-fused):")
for row in store.search("Catalyst optimizer", top_k=2).collect():
    print(f"  {row['chunk_id']} (score {row['score']:.3f}): {row['text'][:60]}")
