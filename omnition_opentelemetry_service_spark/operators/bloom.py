"""Distributed Bloom filter — the shippable membership artifact an
incremental 100 TB dedup pipeline builds ONCE per history epoch and then
reuses across every incoming batch, instead of re-scanning the history
store per batch.

Reference analog: the collector dedups nothing (its unit is a transient
batch), but its queued-retry/exporter layer (exporter/kinesisexporter,
reference components.go:52) is exactly where a training-data collector
would consult "have I already shipped this sequence" — the Bloom filter
is that check at 10^12-row scale. Complements incremental.py: the fpb
partition-pruned anti-join (incremental.py:119) still scans the matching
history partitions every batch; the Bloom word table is FIXED-SIZE state
(``m_bits`` regardless of history size) that answers "definitely new"
without touching history at all. Guarantee: NO false negatives — a key
the filter calls absent is certainly not in history; "maybe present" rows
(true dups + the fp fraction) fall back to the exact anti-join.

Layout: ``m_bits`` bit positions packed into 32-bit words stored as
BIGINT (32, not 64, so no engine ever shifts into a sign bit — DuckDB
errors on ``1::BIGINT << 63`` and Spark would produce a negative long;
PARITY.md trap-class "engine integer edge semantics"). Position ``j`` of
a key is ``XH(key || '|' || j) % m_bits`` with XH the md5-prefix hash
family (dedup.py:43 — cross-engine stable, value in [0, 2^32) so ``%``
is non-negative in both engines).

Shape at scale:

- **build** — one scan of the key set: explode k rows/key → (word, mask)
  → groupBy(word).bit_or. Map-side combinable; the exchange carries at
  most ``m_bits/32`` rows per map task and the result is ``m_bits/32``
  rows total (fixed, e.g. 2^17 bits = 4096 words = 32 KB) — persistable,
  broadcastable, shippable to a serving tier.
- **probe** — one scan of the probe keys: explode k rows/key →
  broadcast-join the word table on word id → groupBy(key) counting
  covered positions; member iff all k covered. The only exchange is the
  probe-key agg (map-side combinable). History is never touched.
- **prefilter** — ``bloom_definitely_new`` rows skip the history join
  entirely; only the maybe-fraction (≈ dup rate + FPR of the new rate)
  reaches the exact anti-join. The filter result is EXACT end-to-end
  (Bloom only ever prunes the definitely-absent side) — pinned by
  tests/test_bloom.py's equivalence-to-plain-anti-join oracle.

FPR contract: with n keys inserted, fpr ≈ (1 - e^(-k·n/m))^k; the test
pins measured fpr on disjoint probes ≤ 3× that bound.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .dedup import _XH_DUCK, _XH_SPARK

BLOOM_BITS = 1 << 17  # 131072 bits = 4096 x 32-bit words = 32 KB state
BLOOM_HASHES = 5


def _pos_sql_spark(key: str, j: str, m_bits: int) -> str:
    h = _XH_SPARK.format(
        s=f"concat(CAST({key} AS STRING), '|', CAST({j} AS STRING))")
    return f"({h}) % {int(m_bits)}"


def _pos_sql_duck(key: str, j: str, m_bits: int) -> str:
    """NULL keys must yield a NULL position, as Spark's concat does.
    DuckDB's concat IGNORES NULL args (PARITY.md trap 25), so an unguarded
    NULL key would hash the literal '|j' — and worse, _XH_DUCK's inner
    concat('0x', NULL-substr) collapses to '0x', which CAST(... AS BIGINT)
    refuses at runtime. The CASE guard short-circuits both."""
    h = _XH_DUCK.format(
        s=f"concat(CAST({key} AS VARCHAR), '|', CAST({j} AS VARCHAR))")
    return (f"(CASE WHEN ({key}) IS NULL THEN NULL "
            f"ELSE ({h}) % {int(m_bits)} END)")


def bloom_fpr_bound(n_keys: int, m_bits: int = BLOOM_BITS,
                    k: int = BLOOM_HASHES) -> float:
    """Theoretical false-positive rate after inserting n_keys."""
    return (1.0 - math.exp(-k * n_keys / float(m_bits))) ** k


def bloom_build(keys: DataFrame, key_col: str = "fp",
                m_bits: int = BLOOM_BITS,
                k: int = BLOOM_HASHES) -> DataFrame:
    """(w, bits): the packed word table — ≤ m_bits/32 rows, fixed size
    regardless of |keys|. Duplicate keys are harmless (bit_or is
    idempotent), so no pre-distinct pass is needed. NULL keys are dropped:
    they carry no identity to remember, and unfiltered they would emit a
    spurious (NULL, NULL) word row."""
    js = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j")
    pos = (keys.select(F.col(key_col).alias("key"), js)
           .filter(F.col("key").isNotNull())
           .select(F.expr(_pos_sql_spark("key", "j", m_bits)).alias("p")))
    return (pos
            .select((F.col("p") / 32).cast("bigint").alias("w"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(p % 32 AS INT))").alias("mask"))
            .groupBy("w")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_build_sql_duck(keys_sql: str, key_col: str = "fp",
                         m_bits: int = BLOOM_BITS,
                         k: int = BLOOM_HASHES) -> str:
    """DuckDB twin of the word table (``keys_sql`` is a relation with
    ``key_col``). NULL keys dropped, mirroring bloom_build."""
    pos = _pos_sql_duck("key", "j", m_bits)
    return f"""
    WITH ks AS (SELECT CAST({key_col} AS VARCHAR) AS key FROM ({keys_sql})
                WHERE {key_col} IS NOT NULL),
    pos AS (SELECT {pos} AS p
            FROM ks CROSS JOIN (SELECT unnest(range({int(k)})) AS j))
    SELECT CAST(p // 32 AS BIGINT) AS w,
           bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
    FROM pos GROUP BY 1"""


def bloom_might_contain(probes: DataFrame, words: DataFrame,
                        key_col: str = "fp",
                        m_bits: int = BLOOM_BITS,
                        k: int = BLOOM_HASHES) -> DataFrame:
    """(<key_col>, might_contain): one row per DISTINCT probe key (the
    output key column keeps the caller's name — the DuckDB twin emits the
    same, so the pair is oracle-slot-ready). The word table joins
    broadcast (fixed ≤ m_bits/32 rows); member iff every one of the k
    positions is covered (a position hit twice by two j's is simply
    tested twice — the all-k count stays correct). A NULL probe key
    yields might_contain=false in BOTH engines (its positions are NULL,
    never covered) — consistent with build dropping NULL keys."""
    js = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j")
    pos = (probes.select(F.col(key_col).alias("key")).distinct()
           .select("key", js)
           .select("key",
                   F.expr(_pos_sql_spark("key", "j", m_bits)).alias("p"))
           .select("key",
                   (F.col("p") / 32).cast("bigint").alias("w"),
                   F.expr("shiftleft(CAST(1 AS BIGINT), "
                          "CAST(p % 32 AS INT))").alias("mask")))
    covered = F.when(
        F.col("bits").isNotNull()
        & (F.expr("bits & mask") == F.col("mask")), 1).otherwise(0)
    return (pos.join(broadcast(words), "w", "left")
            .select("key", covered.alias("c"))
            .groupBy("key")
            .agg((F.sum("c") == F.lit(k)).alias("might_contain"))
            .withColumnRenamed("key", key_col))


def bloom_might_contain_sql_duck(probes_sql: str, keys_sql: str,
                                 key_col: str = "fp",
                                 m_bits: int = BLOOM_BITS,
                                 k: int = BLOOM_HASHES) -> str:
    """DuckDB twin: build + probe end-to-end in SQL (an independent
    re-derivation, not an echo of the Spark word table)."""
    words = bloom_build_sql_duck(keys_sql, key_col, m_bits, k)
    pos = _pos_sql_duck("key", "j", m_bits)
    return f"""
    WITH words AS ({words}),
    pk AS (SELECT DISTINCT CAST({key_col} AS VARCHAR) AS key
           FROM ({probes_sql})),
    pos AS (SELECT key, CAST({pos} // 32 AS BIGINT) AS w,
                   CAST(1 AS BIGINT) << CAST(({pos}) % 32 AS INTEGER)
                   AS mask
            FROM pk CROSS JOIN (SELECT unnest(range({int(k)})) AS j))
    SELECT pos.key AS {key_col},
           (sum(CASE WHEN words.bits IS NOT NULL
                      AND (words.bits & pos.mask) = pos.mask
                     THEN 1 ELSE 0 END) = {int(k)}) AS might_contain
    FROM pos LEFT JOIN words ON pos.w = words.w
    GROUP BY 1"""


def bloom_prefilter_new(batch: DataFrame, history: DataFrame,
                        key_col: str = "fp",
                        m_bits: int = BLOOM_BITS,
                        k: int = BLOOM_HASHES,
                        prebuilt_words: DataFrame | None = None) -> DataFrame:
    """Batch rows whose key is NOT in history, computed as
    definitely-new (Bloom says absent — no false negatives, skips the
    history join) UNION maybe-present verified by the exact anti-join.
    Result is EXACTLY the plain ``batch ANTI JOIN history`` (the test
    oracle); the Bloom only reroutes work. In production the word table
    is built once per history epoch and persisted — pass it as
    ``prebuilt_words`` so per-batch calls never touch history for the
    build. The flag table is persisted here (narrow: one boolean per
    distinct batch key) because BOTH union branches consume it — without
    the cache each branch would re-run the probe agg and, absent
    prebuilt_words, re-scan history for the build; release is
    caller-owned per the repo cache convention. The batch itself is
    still read by both branches (routing demands two consumers)."""
    if prebuilt_words is None:
        words = bloom_build(history.select(key_col), key_col, m_bits, k)
    else:
        words = prebuilt_words
    flags = bloom_might_contain(batch.select(key_col), words,
                                key_col, m_bits, k).persist()
    flagged = batch.join(flags, key_col, "left")
    # NULL batch keys never join flags (NULL != NULL), leaving
    # might_contain NULL; the plain anti-join RETAINS null-key rows
    # (NULL never matches history), so route them to definitely-new —
    # without the coalesce both filters would silently drop them.
    definite_new = flagged.filter(
        ~F.coalesce(F.col("might_contain"), F.lit(False))) \
        .drop("might_contain")
    maybe = flagged.filter(F.col("might_contain")).drop("might_contain")
    verified_new = maybe.join(history.select(key_col).distinct(),
                              key_col, "left_anti")
    return definite_new.unionByName(verified_new)
