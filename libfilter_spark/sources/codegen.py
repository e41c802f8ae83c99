"""Deterministic synthetic source-code repository table.

Shape per BASELINE.json ``input_hint``: (repo:string, path:string,
commit:string, lang:string, content:string). Properties per
FIXTURES.md §A: Zipf-skewed repo sizes with one mega-repo (~30% of
rows, exercises skew salting), ~12 skewed languages, 50–5000-char
pseudo-source content, ~5% exact cross-repo duplicate contents (true
positives for membership probes).

Generation is distributed and *parallelism-invariant*: every value is
a pure function of the global row id (splitmix64-mixed), so the same
(n_rows, seed) produces the same table at local[8] and local[1000] —
required for the two-cluster-size scaling benchmark.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
])

LANGS = np.array(["py", "c", "cpp", "java", "go", "js", "ts", "rs",
                  "rb", "sh", "sql", "md"])
# skewed lang mix: first lang ~35%
_LANG_CUM = np.cumsum(np.array(
    [0.35, 0.15, 0.10, 0.09, 0.07, 0.06, 0.05, 0.04, 0.03, 0.03, 0.02, 0.01]))

_TOKENS = np.array(
    ("def return if else for while import from class self lambda yield "
     "int float str list dict set tuple None True False assert raise try "
     "except with open print len range map filter sum min max sorted zip "
     "struct void static const char double long unsigned signed sizeof "
     "public private final override template typename namespace using "
     "func var let mut impl trait match enum pub crate mod fn go chan").split())


def _mix(ids: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over row ids — the per-row randomness."""
    z = ids.astype(np.uint64) + np.uint64(
        (salt * 0x9E3779B97F4A7C15) % (1 << 64))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _unit(ids: np.ndarray, salt: int) -> np.ndarray:
    return _mix(ids, salt).astype(np.float64) / 2.0**64


def _gen_batch(ids: np.ndarray, seed: int, n_repos: int,
               dup_pool: int = 1024) -> pd.DataFrame:
    # repo: mega-repo gets 30%, remainder Zipf-ish over n_repos
    u = _unit(ids, seed + 1)
    zipf_rank = np.minimum(
        (np.exp(_unit(ids, seed + 2) * np.log(n_repos)) - 1).astype(np.int64),
        n_repos - 1)
    repo_id = np.where(u < 0.30, 0, 1 + zipf_rank)
    org = repo_id % 37

    lang_idx = np.searchsorted(_LANG_CUM, _unit(ids, seed + 3))
    lang = LANGS[np.minimum(lang_idx, len(LANGS) - 1)]

    m = _mix(ids, seed + 4)
    path_dir = (m >> np.uint64(8)) % np.uint64(97)
    path_file = m % np.uint64(9973)

    commits = _mix(ids, seed + 5)
    commits2 = _mix(ids, seed + 6)

    # content identity: ~5% of rows reuse a shared pool of 1024
    # duplicate contents (cross-repo true positives); the rest are
    # unique per content_id
    dup = _unit(ids, seed + 7) < 0.05
    content_id = np.where(dup, _mix(ids, seed + 8) % np.uint64(dup_pool),
                          _mix(ids, seed + 9) | np.uint64(1 << 63))

    # pseudo-source text: token sequence chosen by content_id stream,
    # length 50..5000 chars
    n_tok = 8 + (_mix(content_id, seed + 10) % np.uint64(120)).astype(np.int64)
    rows = []
    tok_n = np.uint64(len(_TOKENS))
    for cid, nt in zip(content_id, n_tok):
        s = _mix(cid + np.arange(nt, dtype=np.uint64), seed + 11)
        toks = _TOKENS[(s % tok_n).astype(np.int64)]
        rows.append(f"// id {cid:x}\n" + " ".join(toks))
    return pd.DataFrame({
        "repo": [f"org{o}/repo{r}" for o, r in zip(org, repo_id)],
        "path": [f"src/m{d}/f{f}.{lg}" for d, f, lg in
                 zip(path_dir, path_file, lang)],
        "commit": [f"{a:016x}{b:016x}{a ^ b:08x}"[:40] for a, b in
                   zip(commits, commits2)],
        "lang": lang,
        "content": rows,
    })


def source_code_table(spark: SparkSession, n_rows: int, seed: int = 42,
                      n_repos: int = 500,
                      partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generator — values depend only on the
    global row id, never on partitioning."""
    rng = spark.range(0, n_rows,
                      numPartitions=partitions) if partitions else \
        spark.range(0, n_rows)

    dup_pool = max(16, n_rows // 256)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(np.uint64), seed,
                                 n_repos, dup_pool)

    return rng.mapInPandas(gen, schema=SCHEMA)


def source_code_pandas(n_rows: int, seed: int = 42,
                       n_repos: int = 500) -> pd.DataFrame:
    """Driver-side oracle twin of :func:`source_code_table`."""
    return _gen_batch(np.arange(n_rows, dtype=np.uint64), seed, n_repos,
                      max(16, n_rows // 256))
