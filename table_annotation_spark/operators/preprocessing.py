"""Stage 2 — preprocess: cell grid → cleaned/oriented cells + table metadata.

Plan shape (scale-first):

1. ``fix_encoding``    — dedupe-compute-rejoin: DISTINCT cell strings through
   an Arrow pandas UDF (mojibake repair), joined back. The distinct set is
   orders of magnitude smaller than the cell set (reference analogue
   parse_table, prp utils.py:221-224 — but GLOBAL across tables, not per-table).
2. ``type_cells``      — same pattern for primitive typing + datatype.
3. ``preprocess_cells`` — ONE shuffle on table_id, then per-table decision
   trees (orientation/header/key) in applyInPandas; emits a denormalized
   cells+meta DataFrame in a single pass (meta repeats per cell — RLE-friendly
   in parquet, avoids a second shuffle/join to reattach it).

At 100 TB: stage 1-2 are shuffle-free except the distinct() (partial agg
map-side); stage 3 is the only full shuffle and it is keyed by table_id which
is high-cardinality and well distributed (sha256).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.typing_fns import get_string_type, type_cell
from .table_analysis import analyze_table, is_concept, recover_encoding

PREP_SCHEMA = StructType(
    [
        StructField("table_id", StringType(), False),
        StructField("content_sha256", StringType(), True),
        StructField("row_idx", IntegerType(), False),
        StructField("col_idx", IntegerType(), False),
        StructField("cell", StringType(), True),
        StructField("is_header", BooleanType(), False),
        StructField("orientation", StringType(), False),
        StructField("orientation_score", DoubleType(), False),
        StructField("has_header", BooleanType(), False),
        StructField("header_score", DoubleType(), False),
        StructField("key_col", IntegerType(), True),
        StructField("key_score", DoubleType(), False),
        StructField("col_type", StringType(), True),
        StructField("col_type_score", DoubleType(), True),
        StructField("col_datatype", StringType(), True),
        StructField("col_datatype_score", DoubleType(), True),
        StructField("n_rows", IntegerType(), False),
        StructField("n_cols", IntegerType(), False),
    ]
)


# ---------------------------------------------------------------- stage 2a
def _fix_encoding_batches(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in it:
        yield s.map(lambda c: recover_encoding(c).strip() if c is not None else "")


def fix_encoding(cells: DataFrame, cell_col: str = "cell") -> DataFrame:
    """P2 over distinct cells, joined back (broadcast when small; Spark AQE
    converts automatically since the distinct side is pre-aggregated)."""
    udf = F.pandas_udf(_fix_encoding_batches, StringType())
    distinct = cells.select(F.col(cell_col).alias("_raw")).distinct()
    fixed = distinct.withColumn("_fixed", udf(F.col("_raw")))
    return (
        cells.join(fixed, cells[cell_col] == fixed["_raw"], "left")
        .drop(cell_col, "_raw")
        .withColumnRenamed("_fixed", cell_col)
    )


def _typing_batches(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in it:
        yield s.map(lambda c: type_cell(c) if c is not None else "")


def _datatype_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.Series]:
    # input: struct<cell, typing>
    for df in it:
        yield pd.Series(
            [
                ""
                if t == ""
                else (get_string_type(c.strip()) if is_concept(t) else t)
                for c, t in zip(df["cell"], df["typing"])
            ]
        )


def type_cells(cells: DataFrame, cell_col: str = "cell", ner=None) -> DataFrame:
    """P7/P8 relationally: DISTINCT cells → typing/datatype UDFs → join back.
    Adds ``cell_typing`` and ``cell_datatype`` columns. ``ner`` plugs the F10
    slot (functions/ner.py) into the cascade; None keeps the regex/unit/phone
    cascade alone."""
    if ner is not None:
        from ..functions.ner import typing_with_ner_batches

        typing_udf = F.pandas_udf(typing_with_ner_batches(ner), StringType())
    else:
        typing_udf = F.pandas_udf(_typing_batches, StringType())
    dt_udf = F.pandas_udf(_datatype_batches, StringType())
    distinct = cells.select(F.col(cell_col).alias("_cell")).distinct()
    typed = distinct.withColumn("_typing", typing_udf(F.col("_cell"))).withColumn(
        "_datatype",
        dt_udf(F.struct(F.col("_cell").alias("cell"), F.col("_typing").alias("typing"))),
    )
    return (
        cells.join(typed, cells[cell_col] == typed["_cell"], "left")
        .drop("_cell")
        .withColumnRenamed("_typing", "cell_typing")
        .withColumnRenamed("_datatype", "cell_datatype")
    )


# ---------------------------------------------------------------- stage 2b
def _prep_one_table(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["row_idx", "col_idx"])
    tid = pdf["table_id"].iloc[0]
    sha = pdf["content_sha256"].iloc[0] if "content_sha256" in pdf else None
    # rebuild the grid (cells already encoding-fixed)
    n_r = int(pdf["row_idx"].max()) + 1
    n_c = int(pdf["col_idx"].max()) + 1
    grid = [[""] * n_c for _ in range(n_r)]
    typing_map: dict[str, set[str]] = {}
    datatype_map: dict[str, set[str]] = {}
    for r, c, cell, ct, cdt in zip(
        pdf["row_idx"], pdf["col_idx"], pdf["cell"],
        pdf["cell_typing"], pdf["cell_datatype"],
    ):
        cell = cell or ""
        grid[int(r)][int(c)] = cell
        if ct:
            typing_map[cell] = {ct}
        if cdt:
            datatype_map[cell] = {cdt}
    ta = analyze_table(grid, typing=typing_map, datatype=datatype_map, table_id=tid)
    cols = {f.name: [] for f in PREP_SCHEMA.fields}
    if ta is None:
        return pd.DataFrame(cols)
    g = ta.grid
    for ri, row in enumerate(g):
        for ci, cell in enumerate(row):
            top_t = ta.col_typing.get(ci, [{"type": None, "score": None}])[0]
            top_d = ta.col_datatype.get(ci, [{"type": None, "score": None}])[0]
            cols["table_id"].append(tid)
            cols["content_sha256"].append(sha)
            cols["row_idx"].append(ri)
            cols["col_idx"].append(ci)
            cols["cell"].append(cell)
            cols["is_header"].append(bool(ta.has_header and ri == 0))
            cols["orientation"].append(ta.orientation)
            cols["orientation_score"].append(float(ta.orientation_score))
            cols["has_header"].append(bool(ta.has_header))
            cols["header_score"].append(float(ta.header_score))
            cols["key_col"].append(ta.key_col)
            cols["key_score"].append(float(ta.key_score))
            cols["col_type"].append(top_t["type"])
            cols["col_type_score"].append(
                float(top_t["score"]) if top_t["score"] is not None else None
            )
            cols["col_datatype"].append(top_d["type"])
            cols["col_datatype_score"].append(
                float(top_d["score"]) if top_d["score"] is not None else None
            )
            cols["n_rows"].append(len(g))
            cols["n_cols"].append(len(g[0]) if g else 0)
    return pd.DataFrame(cols)


def preprocess_cells(cells: DataFrame, ner=None) -> DataFrame:
    """cells(table_id, content_sha256, row_idx, col_idx, cell) → denormalized
    preprocessed cells + per-table/per-column metadata (PREP_SCHEMA).

    Big-table guard: tables >400 rows are deterministically sampled for the
    *decision* pass like the reference (table_preprocessing.py:50-55) — but
    deterministic (first 10 + lowest-hash 390), not random."""
    typed = type_cells(fix_encoding(cells), ner=ner)
    return typed.groupBy("table_id").applyInPandas(_prep_one_table, schema=PREP_SCHEMA)


def table_meta(prep: DataFrame) -> DataFrame:
    """Per-table metadata view over the denormalized output."""
    return prep.select(
        "table_id", "content_sha256", "orientation", "orientation_score",
        "has_header", "header_score", "key_col", "key_score", "n_rows", "n_cols",
    ).distinct()


def column_meta(prep: DataFrame) -> DataFrame:
    """Per-column top typing/datatype view."""
    return prep.select(
        "table_id", "col_idx", "col_type", "col_type_score",
        "col_datatype", "col_datatype_score", "n_rows", "n_cols",
        "key_col", "has_header",
    ).distinct()


def body_cells(prep: DataFrame) -> DataFrame:
    """Non-header cells, re-indexed so row 0 is the first data row."""
    shift = F.when(F.col("has_header"), F.lit(1)).otherwise(F.lit(0))
    return (
        prep.where(~F.col("is_header"))
        .withColumn("row_idx", F.col("row_idx") - shift)
        .select(
            "table_id", "content_sha256", "row_idx", "col_idx", "cell",
            "col_type", "col_type_score", "col_datatype", "col_datatype_score",
            "key_col", "n_rows", "n_cols",
        )
    )
