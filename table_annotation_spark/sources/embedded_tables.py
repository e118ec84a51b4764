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


def _is_table(grid: list[list[str]]) -> bool:
    return len(grid) >= 2 and max((len(r) for r in grid), default=0) >= 2


def _row_blank(row: list[str]) -> bool:
    return all((c or "").strip() == "" for c in row)


def _split_blank_rows(rows: list[list[str]]) -> list[list[list[str]]]:
    """S3 analogue (file_loader.py:140-161): truly BLANK LINES (csv.reader
    yields []) split the document into vertically stacked blocks. A row of
    empty CELLS (';;') is NOT a separator — it stays in the table for the
    P1 empty-row drop in preprocessing, matching the reference's split
    (empty spreadsheet line) vs clean (empty-valued row) distinction."""
    blocks, cur = [], []
    for r in rows:
        if not r:
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(r)
    if cur:
        blocks.append(cur)
    return blocks


def _split_blank_cols(block: list[list[str]]) -> list[list[list[str]]]:
    """S2 analogue (file_loader.py:79-138 mask-CC over non-empty cells, for
    the rectangular side-by-side layout): fully-empty columns split a block
    into horizontally adjacent sub-tables. Applied only when it yields ≥2
    table-ish blocks — a stray empty column inside a single table is left for
    preprocessing's null-column drop (P4)."""
    width = max((len(r) for r in block), default=0)
    blank_col = [
        all(ci >= len(r) or (r[ci] or "").strip() == "" for r in block)
        for ci in range(width)
    ]
    spans, start = [], None
    for ci in range(width):
        if blank_col[ci]:
            if start is not None:
                spans.append((start, ci))
                start = None
        elif start is None:
            start = ci
    if start is not None:
        spans.append((start, width))
    if len(spans) <= 1:
        return [block]
    subs = [
        [[(r[ci] if ci < len(r) else "") for ci in range(lo, hi)] for r in block]
        for lo, hi in spans
    ]
    if sum(1 for s in subs if _is_table(s)) >= 2:
        return subs
    return [block]


def segment_grids(rows: list[list[str]]) -> list[list[list[str]]]:
    """Blank-row then blank-column segmentation; returns the table-ish
    segments in reading order (top→bottom, left→right)."""
    out = []
    for block in _split_blank_rows(rows):
        for sub in _split_blank_cols(block):
            if _is_table(sub):
                out.append(sub)
    return out


def parse_content_to_grids(
    path: str, lang: str, content: str
) -> list[list[list[str]]]:
    """One embedded document → 0..n table grids. Multiple tables embedded in
    one content string (concatenated CSVs separated by blank lines, or
    side-by-side blocks separated by empty columns) each become their own
    grid — the reference's Excel multi-table segmentation
    (annotation/annot_scripts/file_loader.py:79-161) re-expressed for string
    content."""
    ext = "." + path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if lang not in TABLE_LANGS and ext not in TABLE_EXTS:
        return []
    if not content or not content.strip():
        return []
    if lang == "json" or ext == ".json":
        try:
            data = json.loads(content)
        except json.JSONDecodeError:
            return []
        if isinstance(data, list) and data and all(isinstance(r, dict) for r in data):
            cols = list(dict.fromkeys(k for r in data for k in r))
            grid = [cols]
            for r in data:
                grid.append(["" if r.get(c) is None else str(r.get(c, "")) for c in cols])
            return [grid] if _is_table(grid) else []
        if isinstance(data, list) and data and all(isinstance(r, list) for r in data):
            grid = [[("" if v is None else str(v)) for v in r] for r in data]
            return [grid] if _is_table(grid) else []
        return []
    delim = "\t" if (lang == "tsv" or ext == ".tsv") else _sniff_delimiter(content)
    try:
        rows = list(csv.reader(io.StringIO(content), delimiter=delim))
    except csv.Error:
        return []
    return segment_grids(rows)


def parse_content_to_grid(path: str, lang: str, content: str) -> list[list[str]] | None:
    """First (or only) table grid of the document — None when not tabular."""
    grids = parse_content_to_grids(path, lang, content)
    return grids[0] if grids else None


def _extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k.name: [] for k in CELL_SCHEMA.fields}
        for repo, path, commit, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
        ):
            content = content or ""
            base = "\x1f".join((repo or "", path or "", commit or ""))
            sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
            grids = parse_content_to_grids(
                path or "", (lang or "").lower(), content
            )
            for k, grid in enumerate(grids):
                # single-table files keep their plain id (back-compat);
                # multi-table files get one id per segment, in reading order
                tid = hashlib.sha256(
                    (base if len(grids) == 1 else f"{base}\x1f{k}").encode()
                ).hexdigest()
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
            grids = parse_content_to_grids(
                path or "", (lang or "").lower(), content
            )
            out["table_id"].append(tid)
            out["repo"].append(repo)
            out["path"].append(path)
            out["commit"].append(commit)
            out["content_sha256"].append(sha)
            out["kind"].append(
                "skipped" if not grids
                else ("table" if len(grids) == 1 else "multitable")
            )
            out["n_rows"].append(sum(len(g) for g in grids))
            out["n_cols"].append(
                max((max(len(r) for r in g) for g in grids), default=0)
            )
        yield pd.DataFrame(out)


def extract_cells(src: DataFrame) -> DataFrame:
    """src(repo,path,commit,lang,content) → cells(table_id,…,row_idx,col_idx,cell).

    Shuffle-free: pure mapInPandas. Column pruning: only the 5 input columns
    are read (explicit select so the parquet scan prunes).
    """
    return src.select("repo", "path", "commit", "lang", "content").mapInPandas(
        _extract_batches, schema=CELL_SCHEMA
    )


CLEAN_CELL_SCHEMA = StructType(
    [
        StructField("table_id", StringType(), False),
        StructField("content_sha256", StringType(), False),
        StructField("new_r", IntegerType(), False),
        StructField("new_c", IntegerType(), False),
        StructField("cell", StringType(), True),
        StructField("n_kept_rows", IntegerType(), False),
        StructField("n_kept_cols", IntegerType(), False),
        StructField("sample_rank", IntegerType(), True),
    ]
)


def _extract_clean_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    from ..operators.table_analysis import MAX_DECISION_ROWS, clean_grid

    for pdf in batches:
        out: dict[str, list] = {k.name: [] for k in CLEAN_CELL_SCHEMA.fields}
        for repo, path, commit, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"], pdf["content"]
        ):
            content = content or ""
            base = "\x1f".join((repo or "", path or "", commit or ""))
            sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
            grids = parse_content_to_grids(
                path or "", (lang or "").lower(), content
            )
            for k, grid in enumerate(grids):
                tid = hashlib.sha256(
                    (base if len(grids) == 1 else f"{base}\x1f{k}").encode()
                ).hexdigest()
                g = clean_grid(grid)
                n_r = len(g)
                if n_r < 2:  # analyze_table returns None for these
                    continue
                n_c = len(g[0])
                if n_r <= MAX_DECISION_ROWS:
                    ranks = {i: i for i in range(n_r)}
                else:
                    ranks = {i: i for i in range(10)}
                    rest = sorted(
                        range(10, n_r),
                        key=lambda i: hashlib.sha256(
                            (tid + "\x1f" + "\x1f".join(g[i])).encode("utf-8")
                        ).hexdigest(),
                    )
                    for j, i in enumerate(rest[: MAX_DECISION_ROWS - 10]):
                        ranks[i] = 10 + j
                for ri, row in enumerate(g):
                    sr = ranks.get(ri)
                    for ci, cell in enumerate(row):
                        out["table_id"].append(tid)
                        out["content_sha256"].append(sha)
                        out["new_r"].append(ri)
                        out["new_c"].append(ci)
                        out["cell"].append(cell)
                        out["n_kept_rows"].append(n_r)
                        out["n_kept_cols"].append(n_c)
                        out["sample_rank"].append(sr)
        yield pd.DataFrame(out)


def extract_cells_clean(src: DataFrame) -> DataFrame:
    """Fused extract + P1-P4 clean + P6 decision-sample marking, one Python
    pass per document (file_loader.py + table_preprocessing.py:29-55 in a
    single scan).

    The grid is already resident in Python at parse time, so cleaning
    (encoding fix, empty-row/col drop, pad, re-index) and the deterministic
    decision sample (first 10 + lowest-sha256 390 rows) cost no extra
    shuffles — at 100 TB this eliminates four cell-scale exchanges that the
    relational twin in ``preprocess_cells`` needs when starting from an
    already-extracted cell frame. Output coordinates are the CLEANED dense
    grid (pre-transpose); tables whose cleaned grid has <2 rows are dropped
    exactly like ``analyze_table``. Parity with the relational path is
    pinned by TestPrepParity.

    Boundary: one document's table must fit a Python worker (same bound as
    ``extract_cells``); the decision pass downstream only ever reads the
    ≤400 sampled rows per table."""
    return src.select("repo", "path", "commit", "lang", "content").mapInPandas(
        _extract_clean_batches, schema=CLEAN_CELL_SCHEMA
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
