"""In-memory model as a table (S3): fastText ``.vec``-format loader.

The reference materializes an external word-vector model into a queryable
store up front (enter_wordvecs.py:28-53: iterate the fastText text file,
insert word -> packed vector). The engine's equivalent: parse the standard
``.vec`` text format (header line "N D", then "word v1 .. vD" per line)
straight into a DataFrame with ``spark.read.text`` + column splits — fully
distributed (a 2M-word model splits across executors like any text file),
no Python loop, no driver materialization.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_vec_file(path: str, rows: Iterable[tuple[str, list[float]]], dims: int) -> int:
    """Write rows as a fastText-style ``.vec`` text file (test/demo helper —
    the reference consumes a file produced by fastText itself). Returns the
    row count written."""
    n = 0
    with open(path, "w") as f:
        body = []
        for word, vec in rows:
            body.append(word + " " + " ".join(f"{x:.6f}" for x in vec))
            n += 1
        f.write(f"{n} {dims}\n")
        f.write("\n".join(body) + "\n")
    return n


def load_vec_model(spark: SparkSession, path: str) -> DataFrame:
    """(word, embedding array<float>) from a ``.vec`` file. The header line
    ("N D", 2 tokens) is dropped by the token-count filter — no driver-side
    first-line peek, so the scan stays a plain distributed text read."""
    parts = F.split(F.col("value"), " ")
    return (
        spark.read.text(path)
        .where(F.size(parts) > 2)
        .select(
            F.element_at(parts, 1).alias("word"),
            F.transform(
                F.slice(parts, 2, F.size(parts) - 1),
                lambda x: x.cast("float"),
            ).alias("embedding"),
        )
    )
