"""Re-derive functions/text.py's CASE_SKEW_CAPS/LOWS table empirically.

The JVM's Unicode tables (Spark `lower`) and DuckDB's utf8proc lag each
other by Unicode versions; any codepoint one engine lowercases and the
other doesn't silently breaks cross-engine hash parity for every
normalized-text operator (fingerprint, shingles, simhash words, stopword
counts). This sweep compares `lower()` on BOTH engines for every BMP and
plane-1 codepoint and prints the skew table as Python literals.

Run: python tools/case_skew_sweep.py   (~1 min on local[16])
Paste the output over CASE_SKEW_CAPS/CASE_SKEW_LOWS if it changed.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cps = [
        cp
        for cp in list(range(1, 0xFFFF)) + list(range(0x10000, 0x1FFFF))
        if not 0xD800 <= cp <= 0xDFFF
    ]
    pdf = pd.DataFrame({"i": cps, "text": [chr(c) for c in cps]})
    jmap = {
        r.i: r.lo
        for r in spark.createDataFrame(pdf)
        .select("i", F.lower("text").alias("lo"))
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    dmap = {
        int(r[0]): r[1]
        for r in con.execute("SELECT i, lower(text) FROM t").fetchall()
    }
    pairs: dict[int, str] = {}
    conflicts = []
    for cp in cps:
        c, jl, dl = chr(cp), jmap[cp], dmap[cp]
        if jl == dl:
            continue
        if cp == 0x130:  # İ: handled by the explicit replace() pre-expansion
            continue
        if jl != c and dl != c:
            conflicts.append((cp, jl, dl))
            continue
        pairs[cp] = jl if jl != c else dl
    multi = {cp: lo for cp, lo in pairs.items() if len(lo) != 1}
    for cp in multi:
        del pairs[cp]

    def esc(cp: int) -> str:
        return f"\\U{cp:08x}" if cp > 0xFFFF else f"\\u{cp:04x}"

    caps = sorted(pairs)
    print(f"# {len(caps)} skewed codepoints")
    print('CASE_SKEW_CAPS = "' + "".join(esc(c) for c in caps) + '"')
    print('CASE_SKEW_LOWS = "' + "".join(esc(ord(pairs[c])) for c in caps) + '"')
    if conflicts:
        print(f"# CONFLICTS (both engines map, differently!): "
              f"{[(hex(c), j, d) for c, j, d in conflicts]}")
    if multi:
        print(f"# MULTI-CHAR lower mappings needing replace(), not translate():"
              f" {[(hex(c), lo) for c, lo in multi.items()]}")
    spark.stop()
    return 1 if conflicts or multi else 0


if __name__ == "__main__":
    sys.exit(main())
