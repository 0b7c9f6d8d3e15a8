"""Generate sfN variants of the documents/embeddings/events tables for the
scale proof (round-2 verdict item 1): same schemas as the driver's
/root/testdata tables, 10x-100x the rows, WITH adversarial skew the small
tables don't have:

- documents: a near-duplicate cluster holding 10% of the corpus (one
  template, small word-level perturbations) — stresses LSH hot bands and
  the SemDeDup hot-cell caveat; plus ONE paragraph shared verbatim by
  1-in-50 docs, population capped at 10K docs above 500K (a 1000x-hot
  fingerprint at sf1, constant-size above sf10) — stresses the winnowing
  stop-gram df cap and paragraph dedup.
- embeddings: 10% of vectors in one tight cluster around a single center
  (hot IVF cell / hot sign-bucket).
- events: one user owning ~3% of all events (hot sessionize key).

Deterministic (hash-of-id features, fixed numpy seeds per partition), and
generated DISTRIBUTED — mapInPandas over a range frame, so the same script
generates a 10^10-row corpus on a real cluster.

Usage: python tools/gen_scale_data.py [sf] [out_dir] [cluster_frac] [vocab]
                                      [tables]
  tables: optional comma list (documents,embeddings,events) — only these
      are (re)written; lets a finished table survive a straggler in
      another one.
  sf: scale multiplier relative to sf0.1 (default 10 -> "sf1": 50K docs,
      20K embeddings, 1M events)
  cluster_frac: fraction of docs in the near-dup cluster (default 0.1).
      At sf10+ use ~0.01: a 10%-mass EXACT near-dup cluster at 500K docs
      has a ~1.25B-pair truth set — that is exact-dedup's job upstream,
      not a pair enumerator's; keeping the cluster at the same ABSOLUTE
      size isolates volume scaling from truth-set blowup.
  vocab: 'fixed' (default — the 40-word vocabulary) or 'heaps'.
      'heaps' grows the vocabulary with corpus size per Heaps' law
      (V = 100·sqrt(n_docs); ~22K types at 50K docs, ~71K at 500K) with
      a Zipf-shaped (log-uniform rank) frequency distribution — the
      realistic regime for the LSH-linearity proof: the 40-word vocab
      saturates the shingle space, so MinHash band-bucket occupancy
      grows with N there (a generator artifact, not an operator one).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data vector join shuffle stage task executor driver plan codegen "
    "skew salt bucket probe build cache spill"
).split()

LANGS = ["en", "de", "fr", "es", "zh"]
TEMPLATE = VOCAB[:40]  # the near-dup cluster's base text (40 words)
HOT_PARAGRAPH = " ".join(VOCAB[5:25])  # shared verbatim by 1-in-50 docs

# syllables for synthesizing a Heaps-law vocabulary: word(rank) is the
# base-24 syllable spelling of the rank — deterministic, distinct, and
# shingle-diverse (3-gram shingles over these words do not saturate)
_SYLS = (
    "ka to ri mu sen da lo vi pe na chu gor mel ti ba ze fu ya qui "
    "xo bre sta plo drin"
).split()


def _heaps_word(rank: int) -> str:
    out = []
    r = rank
    while True:
        out.append(_SYLS[r % len(_SYLS)])
        r //= len(_SYLS)
        if r == 0:
            break
    return "".join(out)


def main() -> None:
    mult = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "localdata", f"sf{mult * 0.1:g}",
    )
    n_docs = int(5000 * mult)
    n_emb = int(2000 * mult)
    n_events = int(100_000 * mult)
    cluster_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
    n_cluster = int(n_docs * cluster_frac)
    vocab_mode = sys.argv[4] if len(sys.argv) > 4 else "fixed"
    # optional 5th arg: comma list of tables to (re)write — the other
    # tables' plans are still built (cheap) but not executed, so a
    # straggler in one table's generation never forces regenerating the
    # finished ones
    only = set(sys.argv[5].split(",")) - {""} if len(sys.argv) > 5 else set()
    # The hot-paragraph skew probe must stay CONSTANT-SIZE, like the
    # near-dup cluster (see cluster_frac above): a relative 1-in-50 rate
    # at 5M docs puts the verbatim paragraph in 100K docs, whose LSH
    # truth set is quadratic in that population — the sf100h gate
    # emitted 408M pairs and the oracle exhausted the disk replaying
    # them. Cap the population at 10K docs (the sf10 level); sf1/sf10
    # corpora are bit-identical under this rule (step stays 50).
    hot_step = max(50, n_docs // 10_000)
    if vocab_mode == "heaps":
        # Heaps' law V = K·n^beta with K=100, beta=0.5; precompute the
        # word list once (driver) and ship it in the closure
        vocab = [_heaps_word(r) for r in range(int(100 * n_docs ** 0.5))]
    else:
        vocab = list(VOCAB)
    template = vocab[:40] if vocab_mode == "heaps" else list(TEMPLATE)
    hot_paragraph = (
        " ".join(vocab[5:25]) if vocab_mode == "heaps" else HOT_PARAGRAPH
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gen_scale_data")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ------------------------------------------------------------ documents
    def gen_docs(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(42 + int(ids[0]) % (1 << 31))
            texts, langs, sources = [], [], []
            for d in ids:
                d = int(d)
                if d < n_cluster:
                    # near-dup cluster: template with 1-2 perturbed words
                    words = list(template)
                    words[d % len(words)] = vocab[(d * 7) % len(vocab)]
                    if d % 3 == 0:
                        words[(d * 5) % len(words)] = vocab[(d * 11) % len(vocab)]
                    texts.append(" ".join(words))
                else:
                    n = 20 + (d * 2654435761 % 41)  # 20-60 words
                    if vocab_mode == "heaps":
                        # Zipf-shaped ranks: log-uniform over [0, V) puts
                        # most mass on the head, a long tail of rare types
                        u = rng.rand(n)
                        idx = np.minimum(
                            (len(vocab) ** u).astype("int64"), len(vocab) - 1
                        )
                    else:
                        idx = rng.randint(0, len(vocab), size=n)
                    body = " ".join(vocab[i] for i in idx)
                    if d % hot_step == 0:  # hot shared paragraph
                        body = f"{body}\n\n{hot_paragraph}\n\n{body[: len(body) // 2]}"
                    texts.append(body)
                langs.append(LANGS[d % len(LANGS)])
                sources.append(f"src{d % 20}")
            yield pd.DataFrame({
                "doc_id": ids,
                "text": texts,
                "lang": langs,
                "source": sources,
                "n_chars": [len(t) for t in texts],
            })

    docs = (
        spark.range(n_docs).repartition(int(cpus))
        .mapInPandas(gen_docs, "doc_id long, text string, lang string, source string, n_chars long")
    )
    if not only or "documents" in only:
        docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    # ----------------------------------------------------------- embeddings
    def gen_emb(batches):
        import numpy as np
        import pandas as pd

        center = np.random.RandomState(7).randn(64).astype("float32")
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(1042 + int(ids[0]) % (1 << 31))
            vecs = rng.randn(len(ids), 64).astype("float32")
            # cluster_frac of the vectors in one tight cluster
            step = max(int(round(1.0 / cluster_frac)), 1)
            hot = (ids % step) == 0
            vecs[hot] = center + 0.05 * vecs[hot]
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [v for v in vecs],
                "label": (ids % 10).astype("int32"),
            })

    emb = (
        spark.range(n_emb).repartition(int(cpus))
        .mapInPandas(gen_emb, "vec_id long, embedding array<float>, label int")
    )
    if not only or "embeddings" in only:
        emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # --------------------------------------------------------------- events
    def gen_events(batches):
        import numpy as np
        import pandas as pd

        types = np.array(["view", "click", "add", "purchase", "search"])
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(2042 + int(ids[0]) % (1 << 31))
            # one hot user (~3% of events), rest uniform over 15K users
            hot = rng.rand(len(ids)) < 0.03
            users = rng.randint(1, 15_000 * max(int(mult) // 10, 1), size=len(ids))
            users[hot] = 0
            ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
                rng.randint(0, 30 * 24 * 3600, size=len(ids)), unit="s"
            ) + pd.to_timedelta(rng.randint(0, 1_000_000, size=len(ids)), unit="us")
            yield pd.DataFrame({
                "event_id": ids,
                "ts": ts,
                "user_id": users,
                "event_type": types[ids % len(types)],
                "value": np.round(rng.rand(len(ids)) * 100, 4),
                "props": [f'{{"k": {int(k)}}}' for k in rng.randint(0, 100, size=len(ids))],
            })

    # CONTIGUOUS range partitions, no shuffle: boundaries are a pure
    # function of (n_events, ev_parts), so ids[0] — and with it every
    # per-batch RandomState seed — is the same on any cluster layout.
    # The old repartition(cpus) round-robin pushed 3.1M-row Arrow tasks
    # at sf100h and one stalled; ~780K-row partitions keep every
    # mapInPandas task short (the round-5 fix that never got committed).
    ev_parts = max(int(cpus), -(-n_events // 781_250))
    ev = (
        spark.range(n_events, numPartitions=ev_parts)
        .mapInPandas(
            gen_events,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
    )
    if not only or "events" in only:
        ev.write.mode("overwrite").parquet(f"{out}/events.parquet")

    # relational tables: the scale story for dedup/ANN/curation lives in the
    # three tables above; symlink the sf0.1 TPC-H-ish tables so bench's
    # relational queries still run at their usual size
    import subprocess

    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            subprocess.run(
                ["ln", "-s", f"/root/testdata/sf0.1/{t}.parquet", dst], check=False
            )

    for t in ["documents", "embeddings", "events"]:
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows -> {out}/{t}.parquet")


if __name__ == "__main__":
    main()
