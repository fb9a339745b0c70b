"""Fetch retry/backoff ledger + politeness-preserving worker assignment —
the queued-retry exporter semantics applied to the crawl fetch loop.

Reference: the kinesis exporter's producer config carries MaxRetries /
MaxBackoffSeconds (exporter/kinesis/config.go:39-40) and the exporter
queue carries QueueSize / NumWorkers (config.go:50-51, defaults
factory.go:55-57) — retry a failed delivery with capped exponential
backoff, give up after N attempts, and spread work over a fixed worker
pool. Semantics only (the reference delegates the loop to the KPL);
here the ledger is the set-oriented rebuild: given the full attempt
history, ONE aggregate pass decides per key done / retry(when) / dead.

Backoff contract: the exponent is the TRAILING consecutive failure count
(a success resets backoff — the standard producer behavior), the delay is
``min(base_delay * factor^(trail-1), max_backoff)`` (the MaxBackoffSeconds
cap), and a key is dead once the trailing failures reach ``max_retries``
(MaxRetries). All CASE/max_by/conditional-count arithmetic — exactly
expressible in both engines; parameters default to binary-exact values so
the DOUBLE schedule arithmetic is bit-identical cross-engine.

Worker assignment: worker = md5-prefix-hash(host) mod num_workers — the
NumWorkers pool with the crawl twist that a HOST never spans workers
(per-host politeness serialization survives any executor count; the
dedup.py ``x(s)`` hash pattern, exact DuckDB twin). Load per worker is
then an aggregate anyone can inspect before sizing the pool.

Shape at scale: retry_plan is ONE hash-agg exchange on the key with
map-side partials (the attempt history per key is bounded by
max_retries·epochs — never corpus-wide); assign_workers is a pure
projection; worker_load is one bounded (num_workers-row) aggregate. No
joins, no windows, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5-prefix string hash, exact cross-engine twin (operators/dedup.py:43)
# the canonical md5-prefix hash pair lives in dedup.py — import, never
# re-spell (one definition per engine; a future widening must reach every
# consumer, review finding)
from .dedup import _XH_DUCK, _XH_SPARK  # noqa: E402


def _check_params(base_delay: float, factor: float, max_backoff: float,
                  max_retries: int) -> None:
    if base_delay <= 0 or factor < 1 or max_backoff < base_delay:
        raise ValueError(
            f"backoff params out of contract: base {base_delay}, "
            f"factor {factor}, cap {max_backoff}")
    if max_retries < 1:
        raise ValueError(f"max_retries must be >= 1: {max_retries}")


def _plan_exprs(status_col: str, at_col: str, attempt_col: str,
                engine: str) -> dict[str, str]:
    """The shared aggregate recipe, engine-keyed only where function names
    differ (max_by/arg_max). One definition per quantity."""
    mx = "max_by" if engine == "spark" else "arg_max"
    last_ok = (f"max(CASE WHEN {status_col} = 'ok' "
               f"THEN {attempt_col} END)")
    return {
        "tries": "CAST(count(*) AS BIGINT)",
        "last_status": f"{mx}({status_col}, {attempt_col})",
        "last_at": f"{mx}({at_col}, {attempt_col})",
        # trailing consecutive failures = attempts after the last success.
        # Valid because the ledger contract numbers attempts 1..n per key
        # with no gaps (the crawler increments per fetch), so max - last_ok
        # counts exactly the errors that follow the last 'ok'.
        "trail": (f"CAST(max({attempt_col}) - coalesce({last_ok}, 0) "
                  f"AS BIGINT)"),
    }


def _verdict_exprs(base_delay: float, factor: float, max_backoff: float,
                   max_retries: int) -> dict[str, str]:
    backoff = (f"least({base_delay!r} * power({factor!r}, trail - 1), "
               f"{max_backoff!r})")
    outcome = (f"CASE WHEN last_status = 'ok' THEN 'done' "
               f"WHEN trail >= {max_retries} THEN 'dead' "
               f"ELSE 'retry' END")
    next_at = (f"CASE WHEN ({outcome}) = 'retry' "
               f"THEN CAST(last_at + {backoff} AS DOUBLE) "
               f"ELSE CAST(NULL AS DOUBLE) END")
    return {"outcome": outcome, "next_attempt_at": next_at}


def retry_plan(attempts: DataFrame, base_delay: float = 0.5,
               factor: float = 2.0, max_backoff: float = 8.0,
               max_retries: int = 3, id_col: str = "url_id",
               status_col: str = "status", at_col: str = "attempted_at",
               attempt_col: str = "attempt_no") -> DataFrame:
    """(url_id, tries, last_status, outcome, next_attempt_at): per key,
    fold the attempt history ('ok'/'err' rows) into done / dead /
    retry-at. next_attempt_at is NULL unless outcome='retry'."""
    _check_params(base_delay, factor, max_backoff, max_retries)
    ag = _plan_exprs(status_col, at_col, attempt_col, "spark")
    vd = _verdict_exprs(base_delay, factor, max_backoff, max_retries)
    return (attempts.groupBy(id_col)
            .agg(*(F.expr(e).alias(k) for k, e in ag.items()))
            .select(id_col, "tries", "last_status",
                    F.expr(vd["outcome"]).alias("outcome"),
                    F.expr(vd["next_attempt_at"]).alias("next_attempt_at")))


def retry_plan_sql_duck(attempts_table: str, base_delay: float = 0.5,
                        factor: float = 2.0, max_backoff: float = 8.0,
                        max_retries: int = 3, id_col: str = "url_id",
                        status_col: str = "status",
                        at_col: str = "attempted_at",
                        attempt_col: str = "attempt_no") -> str:
    _check_params(base_delay, factor, max_backoff, max_retries)
    ag = _plan_exprs(status_col, at_col, attempt_col, "duck")
    vd = _verdict_exprs(base_delay, factor, max_backoff, max_retries)
    cols = ",\n                 ".join(f"{e} AS {k}" for k, e in ag.items())
    return f"""
    WITH agg AS (SELECT {id_col},
                 {cols}
                 FROM {attempts_table} GROUP BY {id_col})
    SELECT {id_col}, tries, last_status,
           {vd['outcome']} AS outcome,
           {vd['next_attempt_at']} AS next_attempt_at
    FROM agg"""


def worker_expr(host_col: str, num_workers: int, engine: str) -> str:
    """worker id in [0, num_workers): md5-prefix hash of the host, mod the
    pool size — one host maps to exactly one worker on every engine and
    every run. The hash input is the HOST, deliberately: assigning by url
    would parallelize one host across the pool and break the crawl-delay
    serialization the frontier just computed."""
    if num_workers < 1:
        raise ValueError(f"num_workers must be >= 1: {num_workers}")
    xh = (_XH_SPARK if engine == "spark" else _XH_DUCK).format(s=host_col)
    return f"CAST({xh} % {num_workers} AS INT)"


def assign_workers(schedule: DataFrame, num_workers: int = 8,
                   host_col: str = "host") -> DataFrame:
    """schedule + worker column (pure projection — rides the scan)."""
    return schedule.withColumn(
        "worker", F.expr(worker_expr(host_col, num_workers, "spark")))


def worker_load(assigned: DataFrame, host_col: str = "host") -> DataFrame:
    """(worker, n_urls, n_hosts, queue_horizon): per-worker queue stats —
    the QueueSize sizing input (config.go:50). One bounded aggregate
    (num_workers rows); approx_count_distinct is NOT used because the
    host count feeds a capacity decision and must be exact."""
    return (assigned.groupBy("worker")
            .agg(F.count("*").alias("n_urls"),
                 F.countDistinct(host_col).alias("n_hosts"),
                 F.max("scheduled_at").alias("queue_horizon")))


def worker_load_sql_duck(assigned_sql: str,
                         host_col: str = "host") -> str:
    return f"""
    SELECT worker, CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT {host_col}) AS BIGINT) AS n_hosts,
           max(scheduled_at) AS queue_horizon
    FROM ({assigned_sql}) GROUP BY worker"""


# -- deterministic attempts fixture ----------------------------------------------
def attempts_fixture_exprs(id_col: str = "doc_id") -> dict[str, str]:
    """Engine-NEUTRAL per-row pieces of the attempt-history generator:
    key i gets (i % 4 + 1) attempts; attempt ``att`` succeeds iff
    (i + att) % 5 == 0; attempted_at = i*10 + att. Covers done / retry /
    dead (i%4==3, i%5==0: 4 straight errors) and the
    success-resets-backoff trail (i%4==3, i%5==4: ok at att=1 then 3
    errors). Only the explode differs
    by engine (Spark explode(sequence(1, n)) vs DuckDB
    unnest(range(1, n + 1))) — that lives in the two query builders."""
    return {
        "status": (f"CASE WHEN ({id_col} + att) % 5 = 0 "
                   f"THEN 'ok' ELSE 'err' END"),
        "attempted_at": f"CAST({id_col} * 10 + att AS DOUBLE)",
        "n_attempts": f"{id_col} % 4 + 1",
    }


def attempts_fixture(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, attempt_no, status, attempted_at) ledger from a key table —
    Spark half of the fixture (explode rides the scan, no shuffle)."""
    ex = attempts_fixture_exprs(id_col)
    return (ids.select(id_col)
            .select(id_col, F.explode(F.expr(
                f"sequence(CAST(1 AS BIGINT), "
                f"CAST({ex['n_attempts']} AS BIGINT))")).alias("att"))
            .select(id_col,
                    F.col("att").cast("bigint").alias("attempt_no"),
                    F.expr(ex["status"]).alias("status"),
                    F.expr(ex["attempted_at"]).alias("attempted_at")))


def attempts_fixture_sql_duck(ids_sql: str,
                              id_col: str = "doc_id") -> str:
    """DuckDB half — same per-row exprs, unnest(range) for the explode."""
    ex = attempts_fixture_exprs(id_col)
    return f"""
    SELECT {id_col}, CAST(att AS BIGINT) AS attempt_no,
           {ex['status']} AS status,
           {ex['attempted_at']} AS attempted_at
    FROM (SELECT {id_col},
                 unnest(range(1, {ex['n_attempts']} + 1)) AS att
          FROM ({ids_sql}) ks) t"""
