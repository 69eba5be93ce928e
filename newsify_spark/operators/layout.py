"""Data-layout operators: Z-order (Morton) clustering keys for
multi-dimensional row-group pruning.

At 100 TB the scan is won or lost before execution: parquet keeps
min/max statistics per row group, and Spark's filter pushdown skips
groups whose range can't match. A layout sorted on ONE column prunes
that column only — a filter on any other column still touches every
group. Interleaving the bits of several columns into one Morton key and
sorting by IT bounds EVERY interleaved column's range within each group,
so selective filters on any of the dimensions skip most of the file.
(This is the same technique Delta's OPTIMIZE ZORDER BY applies; here it
is a pure column expression + ordered write, no table format needed.)

The key is a codegen'd chain of shift/and/or expressions — no UDF — so
it costs one projection at write time and nothing at read time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each (non-negative
    integer) column: output bit (i*n + j) = bit i of column j. Callers
    bucket/rank non-integer dimensions first (ntile, epoch-day, hash
    mod) — the key only needs RELATIVE order, not exact values.
    ``bits * len(cols)`` must stay <= 63 (bigint).

    WARNING: values >= 2**bits alias onto their low bits (65536 maps
    like 0 at bits=16), silently destroying relative order and thus
    pruning. ``write_zordered`` validates the range by default; callers
    using ``zorder_key`` directly must pre-bucket into [0, 2**bits)."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds 63 (bigint)")
    cc = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cc):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 16,
    validate: bool = True,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partitioned on the Morton key (so files tile the key space)
    and sorted by it within each file (so row groups tile it too). Every
    interleaved column then has tight min/max per row group and filter
    pushdown on ANY of them skips groups.

    ``validate`` (default on) fails fast if any column falls outside
    [0, 2**bits) — out-of-budget values would alias onto their low bits
    and silently degrade pruning. One cheap agg pass vs a full write."""
    if validate:
        lim = 1 << bits
        bounds = df.agg(
            *[F.min(c).cast("long").alias(f"min_{c}") for c in cols],
            *[F.max(c).cast("long").alias(f"max_{c}") for c in cols],
        ).first()
        for c in cols:
            lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
            if lo is not None and (lo < 0 or hi >= lim):
                raise ValueError(
                    f"zorder column {c!r} range [{lo}, {hi}] exceeds the "
                    f"{bits}-bit budget [0, {lim}) — pre-bucket it "
                    f"(ntile/hash mod) or raise bits"
                )
    keyed = df.withColumn("__zkey", zorder_key(cols, bits=bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 8,
) -> int:
    """Rewrite a parquet directory accumulated from many small appends
    (the streaming foreachBatch sink's natural output: one file set per
    micro-batch) into ~``target_file_bytes`` files. Returns the new file
    count, or 0 if the directory was already compact (< ``min_files``).

    Small files are a 100 TB scan killer: each carries footer/open
    overhead and caps parallelism granularity, and a long-running
    streaming sink produces thousands per day. Compaction is the
    maintenance half of the parquet upsert/append story
    (see ``merge.upsert_partitioned``).

    SINGLE-WRITER BOUNDARY: plain parquet has no transaction log, so this
    rewrite (like ``upsert_partitioned``) must not run concurrently with
    any other writer on ``path`` — schedule it between micro-batches or
    on a paused sink. With Delta/Iceberg on the classpath the same call
    becomes OPTIMIZE / rewrite_data_files, which ARE safe under
    concurrent writers (snapshot isolation + optimistic commit); swap at
    deployment, no logic change.

    The rewrite stages into ``path + '.compact.tmp'`` then swaps via two
    renames, so a crash leaves either the old or the new directory intact,
    never a half-written mix.
    """
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    Path = sc._jvm.org.apache.hadoop.fs.Path
    p = Path(path)
    fs = p.getFileSystem(hconf)
    files = [
        f
        for f in fs.listStatus(p)
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    ]
    if len(files) < min_files:
        return 0
    total = sum(f.getLen() for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact.tmp"
    df.coalesce(int(n_out)).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".compact.old"
    fs.delete(Path(old), True)
    if not fs.rename(p, Path(old)):
        raise IOError(f"compact: rename {path} -> {old} failed")
    if not fs.rename(Path(tmp), p):
        fs.rename(Path(old), p)  # roll back
        raise IOError(f"compact: rename {tmp} -> {path} failed")
    fs.delete(Path(old), True)
    return int(n_out)
