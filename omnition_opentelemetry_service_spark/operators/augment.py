"""Training-sequence augmentation — deterministic, expression-level
transforms over pre-tokenized sequences.

First resident: FIM (fill-in-the-middle, Bavarian et al. 2022) — the
standard code/infilling-model data transform. A deterministic per-doc
hash decides (a) whether a sequence is FIM-transformed at all and (b) the
two cut points; selected sequences are re-laid-out PSM-style

    [PRE] prefix [SUF] suffix [MID] middle

so the model learns to produce the middle given both sides. Everything is
a pure projection over the token array (slice/concat, no shuffle, whole-
stage codegen); determinism comes from the mixture md5-prefix hash, so the
transform is identical across reruns, parallelism levels, and engines —
the DuckDB twin (``fim_sql_duck``) recomputes it exactly.

Sentinel ids default to negative ints (vocab-external by construction —
real use passes the tokenizer's reserved special-token ids). Rate uses the
repo's floor-before-cast threshold convention (PARITY.md): keep when
hash < floor(rate * MIX_MOD).

Beyond the reference (its pipeline routes spans; a token pipeline feeding
an infilling trainer needs the FIM relayout as a corpus stage). Scale
shape: zero exchanges — rides whatever partitioning the input has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mixture import MIX_MOD, _H_DUCK, _H_SPARK, _HW_DUCK, _HW_SPARK


def _fim_exprs(h_fmt: str, hw_fmt: str, slice3: tuple[str, str, str],
               arr_fmt: str, cat, rate: float,
               seed: str, pre_id: int, mid_id: int, suf_id: int,
               min_len: int, tok: str = "tokens",
               n: str = "n_tok") -> tuple[str, str]:
    """Engine-generic FIM expression pair (applied?, new tokens) built from
    ONE definition: ``h_fmt`` renders the salted SELECTION hash (mod-1e6,
    the fraction-threshold family), ``hw_fmt`` the WIDE [0, 2^48) hash the
    CUT POINTS reduce — h % (n+1) over the narrow hash would carry a
    ~(n+1)/1e6 modulo bias toward low positions and could never cut past
    token 999,999; over 2^48 the bias is ~(n+1)/2^48, negligible at any
    real sequence length. ``slice3`` gives the three engine slice
    spellings (prefix, suffix, middle) over cut points lo/hi,
    ``arr_fmt``/``cat`` the engine's array-literal and n-ary list concat.
    Returns (applied_sql, tokens_sql) with lo/hi inlined."""
    sel = h_fmt.format(col="doc_id", salt=f"{seed}|sel")
    c1 = f"({hw_fmt.format(col='doc_id', salt=f'{seed}|c1')} % ({n} + 1))"
    c2 = f"({hw_fmt.format(col='doc_id', salt=f'{seed}|c2')} % ({n} + 1))"
    lo = f"least({c1}, {c2})"
    hi = f"greatest({c1}, {c2})"
    thr = int(rate * MIX_MOD)  # floor-before-cast (PARITY threshold rule)
    applied = f"({sel} < {thr} AND {n} >= {min_len})"
    pre, suf, mid = (s.format(tok=tok, n=n, lo=lo, hi=hi) for s in slice3)
    relaid = cat([arr_fmt.format(v=pre_id), pre, arr_fmt.format(v=suf_id),
                  suf, arr_fmt.format(v=mid_id), mid])
    return applied, f"CASE WHEN {applied} THEN {relaid} ELSE {tok} END"


_SLICE_SPARK = (
    "slice({tok}, 1, CAST({lo} AS INT))",
    "slice({tok}, CAST({hi} AS INT) + 1, {n} - CAST({hi} AS INT))",
    "slice({tok}, CAST({lo} AS INT) + 1, CAST({hi} - {lo} AS INT))",
)
_SLICE_DUCK = (
    "list_slice({tok}, 1, CAST({lo} AS INTEGER))",
    "list_slice({tok}, CAST({hi} AS INTEGER) + 1, {n})",
    "list_slice({tok}, CAST({lo} AS INTEGER) + 1, CAST({hi} AS INTEGER))",
)
_ARR_SPARK, _CAT_SPARK = "array({v})", lambda ps: f"concat({', '.join(ps)})"
_ARR_DUCK, _CAT_DUCK = "[{v}]", lambda ps: "(" + " || ".join(ps) + ")"


def fim_transform(seqs: DataFrame, rate: float = 0.5, seed: str = "fim-v1",
                  pre_id: int = -101, mid_id: int = -102,
                  suf_id: int = -103, min_len: int = 2) -> DataFrame:
    """PSM fill-in-the-middle relayout over (doc_id, tokens, n_tok, ...).

    ``rate`` of sequences (hash-selected, so the choice is a property of
    the document, not of the run) with at least ``min_len`` tokens are cut
    at two near-uniform points lo <= hi in [0, n] (wide-hash mod n+1 —
    bias ~(n+1)/2^48) and re-laid-out
    [PRE]+prefix+[SUF]+suffix+[MID]+middle; the rest pass through
    unchanged. Empty prefix/middle/suffix regions are legal (cuts at the
    ends / coincident cuts), matching the reference FIM recipe's corner
    cases. Output replaces ``tokens``/``n_tok`` and adds ``fim_applied``.
    """
    applied, toks = _fim_exprs(_H_SPARK, _HW_SPARK, _SLICE_SPARK,
                               _ARR_SPARK, _CAT_SPARK, rate, seed,
                               pre_id, mid_id, suf_id, min_len)
    others = [c for c in seqs.columns if c not in ("tokens", "n_tok")]
    return seqs.select(
        *others,
        F.expr(applied).alias("fim_applied"),
        F.expr(toks).alias("tokens"),
    ).withColumn("n_tok", F.size("tokens"))


def fim_sql_duck(rate: float = 0.5, seed: str = "fim-v1",
                 pre_id: int = -101, mid_id: int = -102,
                 suf_id: int = -103, min_len: int = 2,
                 from_table: str = "seq") -> str:
    """DuckDB twin: identical hash, cuts, layout, and corner cases."""
    applied, toks = _fim_exprs(_H_DUCK, _HW_DUCK, _SLICE_DUCK, _ARR_DUCK,
                               _CAT_DUCK, rate, seed,
                               pre_id, mid_id, suf_id, min_len)
    return (f"SELECT doc_id, source, seq_no, {applied} AS fim_applied, "
            f"{toks} AS tokens, len({toks}) AS n_tok FROM {from_table}")
