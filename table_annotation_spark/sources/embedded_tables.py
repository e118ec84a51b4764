"""Stage 1 — extract: source-code repo table → exploded cell grid.

Input (BASELINE.json input_hint): DataFrame(repo, path, commit, lang, content).
Output: cells DataFrame (table_id, row_idx, col_idx, cell) + a per-table
manifest carrying content_sha256 (the per-row invariant vs the reference).

Reference analogue: file_loader.txt_to_table — chardet + csv.Sniffer dispatch
(/root/reference/preprocessing/prp_scripts/file_loader.py:37-69,140-150).
Here tables are *embedded in a column*, so `spark.read.csv` cannot apply; the
parse is a mapInPandas (Arrow-batched, one pass, no per-row Python UDF) that
emits long-form cells. At 100 TB the input is partitioned by (repo) on read;
parsing is embarrassingly parallel and shuffle-free.
"""

from __future__ import annotations

import csv
import hashlib
import io
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

CELL_SCHEMA = StructType(
    [
        StructField("table_id", StringType(), False),
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
        StructField("commit", StringType(), True),
        StructField("content_sha256", StringType(), False),
        StructField("row_idx", IntegerType(), False),
        StructField("col_idx", IntegerType(), False),
        StructField("cell", StringType(), True),
    ]
)

MANIFEST_SCHEMA = StructType(
    [
        StructField("table_id", StringType(), False),
        StructField("repo", StringType(), True),
        StructField("path", StringType(), True),
        StructField("commit", StringType(), True),
        StructField("content_sha256", StringType(), False),
        StructField("kind", StringType(), False),  # table | skipped
        StructField("n_rows", IntegerType(), False),
        StructField("n_cols", IntegerType(), False),
    ]
)

_DELIMS = [",", "\t", ";", ":"]
TABLE_LANGS = {"csv", "tsv", "json"}
TABLE_EXTS = {".csv", ".tsv", ".txt", ".json"}


def _sniff_delimiter(text: str) -> str:
    """csv.Sniffer over the reference's candidate set (file_loader.py:47-53);
    fall back to the delimiter with the most consistent per-line count."""
    sample = text[:8192]
    try:
        return csv.Sniffer().sniff(sample, delimiters="".join(_DELIMS)).delimiter
    except csv.Error:
        lines = sample.splitlines() or [""]
        best, best_count = ",", -1
        for d in _DELIMS:
            c = lines[0].count(d)
            if c > best_count:
                best, best_count = d, c
        return best


def parse_content_to_grid(path: str, lang: str, content: str) -> list[list[str]] | None:
    """One embedded document → 2D grid of strings, or None if not tabular."""
    ext = "." + path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if lang not in TABLE_LANGS and ext not in TABLE_EXTS:
        return None
    if not content or not content.strip():
        return None
    if lang == "json" or ext == ".json":
        try:
            data = json.loads(content)
        except json.JSONDecodeError:
            return None
        if isinstance(data, list) and data and all(isinstance(r, dict) for r in data):
            cols = list(dict.fromkeys(k for r in data for k in r))
            grid = [cols]
            for r in data:
                grid.append(["" if r.get(c) is None else str(r.get(c, "")) for c in cols])
            return grid
        if isinstance(data, list) and data and all(isinstance(r, list) for r in data):
            return [[("" if v is None else str(v)) for v in r] for r in data]
        return None
    delim = "\t" if (lang == "tsv" or ext == ".tsv") else _sniff_delimiter(content)
    try:
        rows = list(csv.reader(io.StringIO(content), delimiter=delim))
    except csv.Error:
        return None
    grid = [[c for c in r] for r in rows if r]
    if len(grid) < 2 or max((len(r) for r in grid), default=0) < 2:
        return None  # not a table: single line / single column
    return grid


def _extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k.name: [] for k in CELL_SCHEMA.fields}
        for repo, path, commit, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
        ):
            content = content or ""
            tid = hashlib.sha256(
                "\x1f".join((repo or "", path or "", commit or "")).encode()
            ).hexdigest()
            sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
            grid = parse_content_to_grid(path or "", (lang or "").lower(), content)
            if grid is None:
                continue
            for ri, row in enumerate(grid):
                for ci, cell in enumerate(row):
                    out["table_id"].append(tid)
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["commit"].append(commit)
                    out["content_sha256"].append(sha)
                    out["row_idx"].append(ri)
                    out["col_idx"].append(ci)
                    out["cell"].append(cell)
        yield pd.DataFrame(out)


def _manifest_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k.name: [] for k in MANIFEST_SCHEMA.fields}
        for repo, path, commit, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
        ):
            content = content or ""
            tid = hashlib.sha256(
                "\x1f".join((repo or "", path or "", commit or "")).encode()
            ).hexdigest()
            sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
            grid = parse_content_to_grid(path or "", (lang or "").lower(), content)
            out["table_id"].append(tid)
            out["repo"].append(repo)
            out["path"].append(path)
            out["commit"].append(commit)
            out["content_sha256"].append(sha)
            out["kind"].append("table" if grid is not None else "skipped")
            out["n_rows"].append(len(grid) if grid else 0)
            out["n_cols"].append(max((len(r) for r in grid), default=0) if grid else 0)
        yield pd.DataFrame(out)


def extract_cells(src: DataFrame) -> DataFrame:
    """src(repo,path,commit,lang,content) → cells(table_id,…,row_idx,col_idx,cell).

    Shuffle-free: pure mapInPandas. Column pruning: only the 5 input columns
    are read (explicit select so the parquet scan prunes).
    """
    return src.select("repo", "path", "commit", "lang", "content").mapInPandas(
        _extract_batches, schema=CELL_SCHEMA
    )


def extract_manifest(src: DataFrame) -> DataFrame:
    """One row per source row — kind=table|skipped, with content_sha256.

    Guarantees the per-row sha256(content) invariant is accounted for even
    for non-table files (FIXTURES.md §1.7).
    """
    return src.select("repo", "path", "commit", "lang", "content").mapInPandas(
        _manifest_batches, schema=MANIFEST_SCHEMA
    )


def with_source_ids(src: DataFrame) -> DataFrame:
    """Adds table_id + content_sha256 columns JVM-side (sha2 codegen, no UDF)."""
    return src.withColumn(
        "table_id",
        F.sha2(F.concat_ws("\x1f", "repo", "path", "commit"), 256),
    ).withColumn("content_sha256", F.sha2(F.col("content"), 256))
