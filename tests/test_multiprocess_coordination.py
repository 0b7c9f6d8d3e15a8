"""True multi-PROCESS coordination (r6 verdict #3): the file token
bucket, the shared cost ledger + budget stop, and chunk claims are
proven across separate python/Spark processes sharing only a
filesystem — the shape of a real cluster — not threads in one JVM.

Worker processes synchronize through sentinel files: each worker's
client blocks its first LLM call until the parent sees every worker
inside the chunk loop (claim files present) and drops a "go" file, so
all workers observe the SAME committed cache state (empty) and land in
one claim generation deterministically.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BUCKET_WORKER = """
import sys, time
sys.path.insert(0, {repo!r})
from ondine_spark.orchestration.coordination import FileTokenBucket

b = FileTokenBucket({dir!r}, "m", rpm={rpm})
t0 = time.time()
for _ in range({n}):
    b.acquire()
print(time.time() - t0)
"""


def test_file_token_bucket_global_rate_across_processes(tmp_path):
    """3 processes x 12 acquires against ONE bucket at rpm=600
    (10 tokens/s, burst 10): 36 grants need >= (36-10)/10 = 2.6 s of
    refill no matter how the grants interleave. A per-process bucket
    would finish in ~(12-10)/10 = 0.2 s each."""
    d = str(tmp_path / "rl")
    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             BUCKET_WORKER.format(repo=REPO, dir=d, rpm=600, n=12)],
            stdout=subprocess.PIPE,
        )
        for _ in range(3)
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    elapsed = time.time() - t0
    assert elapsed >= 2.3, f"global rate not enforced: {elapsed:.2f}s"
    assert elapsed < 30.0, f"bucket wedged: {elapsed:.2f}s"


def test_file_token_bucket_penalize_blocks_other_process(tmp_path):
    """A Retry-After penalty recorded by one process delays grants to a
    DIFFERENT process (shared not_before)."""
    from ondine_spark.orchestration.coordination import FileTokenBucket

    d = str(tmp_path / "rl2")
    a = FileTokenBucket(d, "m", rpm=60_000)
    a.penalize(1.2)
    code = BUCKET_WORKER.format(repo=REPO, dir=d, rpm=60_000, n=1)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, timeout=60
    )
    assert out.returncode == 0, out.stderr.decode()[-500:]
    assert time.time() - t0 >= 1.0  # the other process's penalty held


CHUNK_WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

from ondine_spark import PipelineBuilder
from ondine_spark.streaming.runner import BudgetExceededError, execute_chunked

tag = sys.argv[1]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("coord-" + tag)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

GO = {go!r}
CALLS = {calls_dir!r} + "/" + tag + ".calls"

class GatedClient:
    def complete(self, prompt, system=None):
        while not os.path.exists(GO):
            time.sleep(0.05)
        with open(CALLS, "a") as f:
            f.write("x\\n")
        return {{"text": "ok", "tokens_in": 4, "tokens_out": 1,
                "cost": "0.001"}}

rows = [{{"id": f"r{{i:03d}}", "t": f"text {{i}}"}} for i in range({n_rows})]
p = (
    PipelineBuilder(spark)
    .from_dataframe(spark.createDataFrame(rows), ["t"], id_column="id")
    .with_prompt("Say: {{t}}", ["out"])
    .with_custom_llm_client(lambda: GatedClient())
    .with_checkpoint_dir({ckpt!r}, "mp")
    .with_multiprocess_coordination()
    {budget_line}
    .build()
)
try:
    s = execute_chunked(p, chunk_size={chunk_size})
    result = {{"outcome": "done", "chunks": len(s.chunks),
               "rows": s.total_rows, "cost": str(s.total_cost)}}
except BudgetExceededError as e:
    result = {{"outcome": "budget", "err": str(e)}}
with open({out_dir!r} + "/" + tag + ".json", "w") as f:
    json.dump(result, f)
"""


def _spawn_workers(tmp_path, n_rows, chunk_size, budget=None, workers=2):
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    calls_dir = str(tmp_path / "calls")
    go = str(tmp_path / "go")
    os.makedirs(out_dir)
    os.makedirs(calls_dir)
    budget_line = f".with_max_budget('{budget}')" if budget else ""
    code = CHUNK_WORKER.format(
        repo=REPO, go=go, calls_dir=calls_dir, ckpt=ckpt,
        out_dir=out_dir, n_rows=n_rows, chunk_size=chunk_size,
        budget_line=budget_line,
    )
    env = {**os.environ, "PYTHONPATH": REPO}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, f"w{i}"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        )
        for i in range(workers)
    ]
    # every worker is inside the chunk loop once `workers` claim files
    # exist (each claims one chunk, then blocks in its gated client);
    # only then release the gate so all observed the same (empty) cache
    claims_root = os.path.join(ckpt, "claims")
    deadline = time.time() + 300
    while time.time() < deadline:
        n_claims = sum(
            len(files) for _, _, files in os.walk(claims_root)
        )
        if n_claims >= workers:
            break
        if any(p.poll() not in (None, 0) for p in procs):
            break
        time.sleep(0.2)
    with open(go, "w") as f:
        f.write("go")
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=600)
        if p.returncode != 0:
            errs.append(err.decode()[-2000:])
    assert not errs, errs
    results = {}
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name)) as f:
            results[name.split(".")[0]] = json.load(f)
    calls = 0
    for name in os.listdir(calls_dir):
        with open(os.path.join(calls_dir, name)) as f:
            calls += sum(1 for _ in f)
    return ckpt, results, calls


def test_chunk_claims_disjoint_no_double_invocation(spark, tmp_path):
    """2 concurrent workers on one session: chunks split disjointly via
    claims, every row invoked EXACTLY once across processes, union of
    commits is the complete corpus."""
    n_rows, chunk_size = 60, 10
    ckpt, results, calls = _spawn_workers(tmp_path, n_rows, chunk_size)
    assert set(results) == {"w0", "w1"}
    assert all(r["outcome"] == "done" for r in results.values()), results
    # exactly one invocation per row across BOTH processes
    assert calls == n_rows, (calls, results)
    # chunks split disjointly and completely
    total_chunks = sum(r["chunks"] for r in results.values())
    assert total_chunks == n_rows // chunk_size, results
    assert sum(r["rows"] for r in results.values()) == n_rows
    # both workers actually participated (the gate guarantees overlap)
    assert all(r["chunks"] >= 1 for r in results.values()), results
    # the committed union is the full corpus, no null cells
    from ondine_spark.sources.cache import read_cache

    cached = read_cache(spark, ckpt, "mp")
    assert cached.count() == n_rows
    assert cached.filter("response_text IS NULL").count() == 0


def test_shared_budget_stops_all_processes_within_one_chunk(spark, tmp_path):
    """2 concurrent workers, one shared budget: the ledger makes each
    worker's boundary check see the GLOBAL spend, so total committed
    cost stays under budget + one in-flight chunk per worker."""
    from decimal import Decimal

    n_rows, chunk_size = 60, 10
    per_row = Decimal("0.001")  # explicit per-call cost in the client
    per_chunk = per_row * chunk_size
    budget = per_chunk * 2 + per_chunk / 2  # stops inside chunk 3 of 6
    ckpt, results, calls = _spawn_workers(
        tmp_path, n_rows, chunk_size, budget=str(budget)
    )
    assert set(results) == {"w0", "w1"}
    # at least one worker hit the budget stop; no worker ran to "done"
    # with the full corpus
    outcomes = sorted(r["outcome"] for r in results.values())
    assert "budget" in outcomes, results
    # global committed spend from the single source of truth (the cache)
    from ondine_spark.sources.cache import read_cache

    cached = read_cache(spark, ckpt, "mp")
    from pyspark.sql import functions as F

    spent = Decimal(
        str(cached.agg(F.sum("cost")).collect()[0][0])
    ) if cached is not None else Decimal(0)
    # halts within one chunk per worker: budget + 2 in-flight chunks max
    assert spent <= budget + 2 * per_chunk, (spent, budget)
    # and the stop actually bit: the corpus was NOT fully processed
    assert spent < per_row * n_rows, (spent, results)
