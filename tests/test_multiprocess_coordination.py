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


CRASH_WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

from ondine_spark import PipelineBuilder
from ondine_spark.streaming.runner import execute_chunked

tag = sys.argv[1]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("coordcrash-" + tag)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

GO = {go!r}
CALLS = {calls_dir!r} + "/" + tag + ".calls"
CRASH = tag == "w0"

class GatedClient:
    def complete(self, prompt, system=None):
        while not os.path.exists(GO):
            time.sleep(0.05)
        if CRASH:
            os._exit(9)  # kills the UDF worker; local maxFailures=1 fails the job
        time.sleep(0.08)  # keep the survivor busy past the lease TTL
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
    .with_checkpoint_dir({ckpt!r}, "mpc")
    .with_multiprocess_coordination(lease_ttl=2.0)
    .build()
)
s = execute_chunked(p, chunk_size={chunk_size})
with open({out_dir!r} + "/" + tag + ".json", "w") as f:
    json.dump({{"outcome": "done", "chunks": len(s.chunks),
               "rows": s.total_rows,
               "unresolved": s.unresolved_chunks}}, f)
"""


def test_crashed_claimant_chunk_is_stolen_and_completed(spark, tmp_path):
    """r7 verdict #5: a worker that claims a chunk and DIES mid-chunk
    (before commit) leaves a stale claim; the surviving same-generation
    worker's recovery pass steals it after the lease TTL and processes
    it, so the session converges with the FULL corpus and no manual
    re-run."""
    n_rows, chunk_size = 60, 10
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    calls_dir = str(tmp_path / "calls")
    go = str(tmp_path / "go")
    os.makedirs(out_dir)
    os.makedirs(calls_dir)
    code = CRASH_WORKER.format(
        repo=REPO, go=go, calls_dir=calls_dir, ckpt=ckpt,
        out_dir=out_dir, n_rows=n_rows, chunk_size=chunk_size,
    )
    env = {**os.environ, "PYTHONPATH": REPO}
    procs = {
        tag: subprocess.Popen(
            [sys.executable, "-c", code, tag],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        )
        for tag in ("w0", "w1")
    }
    claims_root = os.path.join(ckpt, "claims")
    deadline = time.time() + 300
    while time.time() < deadline:
        n_claims = sum(len(fs) for _, _, fs in os.walk(claims_root))
        if n_claims >= 2:
            break
        time.sleep(0.2)
    with open(go, "w") as f:
        f.write("go")
    # w0 crashes (its UDF worker os._exit(9)s the first invocation)
    _, err0 = procs["w0"].communicate(timeout=600)
    assert procs["w0"].returncode != 0, "w0 was supposed to crash"
    # w1 survives, finishes its share, then steals w0's stale chunk
    _, err1 = procs["w1"].communicate(timeout=600)
    assert procs["w1"].returncode == 0, err1.decode()[-2000:]

    with open(os.path.join(out_dir, "w1.json")) as f:
        r1 = json.load(f)
    assert r1["outcome"] == "done"
    assert r1["unresolved"] == [], r1
    # the survivor owned ALL chunks: its share + the stolen one
    assert r1["chunks"] == n_rows // chunk_size, r1
    assert r1["rows"] == n_rows, r1
    # every row invoked exactly once, all by the survivor
    with open(os.path.join(calls_dir, "w1.calls")) as f:
        calls = sum(1 for _ in f)
    assert calls == n_rows, calls
    # the full corpus is durably committed, the steal is on record
    from ondine_spark.sources.cache import read_cache

    cached = read_cache(spark, ckpt, "mpc")
    assert cached.count() == n_rows
    assert cached.filter("response_text IS NULL").count() == 0
    gen_dirs = [
        os.path.join(d, f) for d, _, fs in os.walk(claims_root)
        for f in fs if ".dead." in f
    ]
    assert len(gen_dirs) == 1, gen_dirs  # exactly one stolen claim


def _drive(gen):
    """Run a recover() generator to completion; return (yielded, returned)."""
    stolen = []
    while True:
        try:
            stolen.append(next(gen))
        except StopIteration as stop:
            return stolen, stop.value


def test_recover_waits_out_fresh_lease_of_dead_owner(tmp_path):
    """r8 verdict #1b: a claimant that died < lease_ttl ago leaves an
    uncommitted claim that is NOT yet stale. The recovery pass must poll
    until the lease expires and then steal — not report a hole from one
    instantaneous staleness check."""
    from ondine_spark.orchestration.coordination import ChunkClaims

    c = ChunkClaims(str(tmp_path), "s", "g", lease_ttl=0.6)
    # a dead owner's claim: file exists, freshly touched, no heartbeat
    with open(c._claim_path(0), "w") as f:
        f.write("99999 0\n")
    assert not c.stale(0)  # the lease has NOT expired yet
    t0 = time.time()
    stolen, leftover = _drive(c.recover([0]))
    assert stolen == [0] and leftover == []
    # it actually waited for lease expiry rather than stealing a live lease
    assert time.time() - t0 >= 0.3


def test_recover_sees_late_commit_by_live_owner(tmp_path):
    """A live-and-slow owner keeps heartbeating and commits mid-pass:
    recover() must NOT steal, and the chunk must not be unresolved."""
    import threading

    from ondine_spark.orchestration.coordination import ChunkClaims

    owner = ChunkClaims(str(tmp_path), "s", "g", lease_ttl=0.8)
    assert owner.claim(0)  # heartbeat thread keeps the lease fresh
    survivor = ChunkClaims(str(tmp_path), "s", "g", lease_ttl=0.8)
    threading.Timer(0.5, owner.commit, args=(0,)).start()
    stolen, leftover = _drive(survivor.recover([0]))
    assert stolen == [] and leftover == []
    assert survivor.committed(0)


def test_recover_leaves_live_uncommitted_owner_unresolved(tmp_path):
    """An owner that stays alive (heartbeating) but never commits within
    the deadline: recover() must give up at ~2x lease_ttl and report the
    chunk unresolved — never steal a live lease."""
    from ondine_spark.orchestration.coordination import ChunkClaims

    owner = ChunkClaims(str(tmp_path), "s", "g", lease_ttl=0.8)
    assert owner.claim(0)  # daemon heartbeat refreshes mtime every ttl/4
    survivor = ChunkClaims(str(tmp_path), "s", "g", lease_ttl=0.8)
    t0 = time.time()
    stolen, leftover = _drive(survivor.recover([0]))
    elapsed = time.time() - t0
    assert stolen == [] and leftover == [0]
    assert elapsed >= 1.5, elapsed  # honoured the 2x-ttl deadline
    assert os.path.exists(owner._claim_path(0))  # lease never stolen


MEMO_WORKER = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

from ondine_spark import PipelineBuilder

tag = sys.argv[1]
spark = (
    SparkSession.builder.master("local[4]")
    .appName("memo-" + tag)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

GO = {go!r}
CALLS = {calls_dir!r} + "/" + tag + ".calls"

class CountingClient:
    def complete(self, prompt, system=None):
        if GO:
            while not os.path.exists(GO):
                time.sleep(0.05)
        with open(CALLS, "a") as f:
            f.write("x\\n")
        return {{"text": "ans:" + prompt[-6:], "tokens_in": 4,
                "tokens_out": 1, "cost": "0.001"}}

rows = [{{"id": f"r{{i:03d}}", "t": f"text {{i}}"}} for i in range({n_rows})]
p = (
    PipelineBuilder(spark)
    .from_dataframe(spark.createDataFrame(rows), ["t"], id_column="id")
    .with_prompt("Say: {{t}}", ["out"])
    .with_custom_llm_client(lambda: CountingClient())
    .with_response_memo({memo!r})
    .build()
)
res = p.execute()
n = res.data.filter("out IS NOT NULL").count()
with open({out_dir!r} + "/" + tag + ".json", "w") as f:
    json.dump({{"rows": n}}, f)
"""


def test_response_memo_concurrent_writers_stay_consistent(tmp_path):
    """r7 verdict #8: two UNCOORDINATED processes share one
    with_response_memo dir and run the same prompts concurrently — both
    miss, both invoke, both append (the staged-rename append path). The
    memo must stay readable, total spend is bounded by 2x (each process
    invokes each prompt at most once), and a third process answers
    everything from the memo with ZERO invocations."""
    memo = str(tmp_path / "memo")
    out_dir = str(tmp_path / "out")
    calls_dir = str(tmp_path / "calls")
    go = str(tmp_path / "go")
    os.makedirs(out_dir)
    os.makedirs(calls_dir)
    n_rows = 40
    env = {**os.environ, "PYTHONPATH": REPO}

    def run(tag, gate):
        code = MEMO_WORKER.format(
            repo=REPO, go=gate, calls_dir=calls_dir, memo=memo,
            out_dir=out_dir, n_rows=n_rows,
        )
        return subprocess.Popen(
            [sys.executable, "-c", code, tag],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        )

    # phase 1: two gated processes, released together → maximal overlap
    procs = [run("m0", go), run("m1", go)]
    time.sleep(5)  # both sessions up and blocked at the gate
    with open(go, "w") as f:
        f.write("go")
    errs = []
    for p in procs:
        _, err = p.communicate(timeout=600)
        if p.returncode != 0:
            errs.append(err.decode()[-2000:])
    assert not errs, errs
    for tag in ("m0", "m1"):
        with open(os.path.join(out_dir, f"{tag}.json")) as f:
            assert json.load(f)["rows"] == n_rows
    calls = 0
    for name in os.listdir(calls_dir):
        with open(os.path.join(calls_dir, name)) as f:
            calls += sum(1 for _ in f)
    # bounded: each process invokes each prompt at most once
    assert n_rows <= calls <= 2 * n_rows, calls

    # phase 2: a third, later process answers 100% from the memo
    p3 = run("m2", "")
    _, err3 = p3.communicate(timeout=600)
    assert p3.returncode == 0, err3.decode()[-2000:]
    with open(os.path.join(out_dir, "m2.json")) as f:
        assert json.load(f)["rows"] == n_rows
    assert not os.path.exists(os.path.join(calls_dir, "m2.calls")), (
        "third run should invoke nothing"
    )
