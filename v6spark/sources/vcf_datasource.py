"""``spark.read.format("vcf")`` — a Python DataSource V2 connector.

The expression-based parser (sources/vcf.py) is the fast path; this
connector is the *ergonomic* path — after ``register_vcf_source(spark)``
any VCF loads with the standard reader API:

    spark.read.format("vcf").load("cohort.vcf")            # calls (long)
    spark.read.format("vcf").option("table", "variants").load(path)

Built on PySpark 4's Python DataSource API (``pyspark.sql.datasource``):
the driver plans one input partition per data shard; executors run the
pure-Python record parser over their shard and yield Arrow-batched
rows.  Partitioning: the file is split into line-aligned byte ranges
(``n_partitions`` option, default 8) so large VCFs parse in parallel —
each partition seeks to its offset and starts at the next full line,
the standard text-split contract.

Per-row Python is inherently slower than the Catalyst parser — this
source exists for connector-surface parity (reference A3,
``variation6/in_out/vcf.py``), and the test suite pins its output
EQUAL to the expression parser's.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

CALLS_SCHEMA = (
    "variant_id string, chrom string, pos long, sample_id string, "
    "gt array<int>, dp int, gq int"
)
VARIANTS_SCHEMA = (
    "variant_id string, chrom string, pos long, vcf_id string, ref string, "
    "alt array<string>, qual double, filter string"
)


def _parse_header(path: str) -> list[str]:
    with open(path, "rt") as fh:
        for line in fh:
            if line.startswith("#CHROM"):
                return line.rstrip("\n").split("\t")[9:]
            if not line.startswith("#"):
                break
    raise ValueError(f"not a VCF (no #CHROM header line): {path}")


def _opt_int(v: str | None) -> int | None:
    if v in (None, ".", ""):
        return None
    try:
        return int(v)
    except ValueError:  # malformed value -> NULL, matching try_cast
        return None


def _opt_float(v: str | None) -> float | None:
    if v in (None, ".", ""):
        return None
    try:
        return float(v)
    except ValueError:
        return None


def _parse_record(line: str, samples: list[str]):
    # Lenient like the Catalyst parser (try_cast / out-of-range -> NULL):
    # malformed numerics become NULL, short lines are padded — a bad
    # record must not abort a 100 TB ingest job.
    f = line.rstrip("\n").split("\t")
    if len(f) < 8:
        f = f + [""] * (8 - len(f))
    chrom, vid, ref, alt_s, filt = f[0], f[2], f[3], f[4], f[6]
    pos = _opt_int(f[1])
    alt = alt_s.split(",")
    variant_id = f"{chrom}:{f[1]}:{ref}:{alt_s}"
    fmt = f[8].split(":") if len(f) > 8 else []
    variant = (
        variant_id,
        chrom,
        pos,
        None if vid == "." else vid,
        ref,
        alt,
        _opt_float(f[5]),
        filt,
    )
    calls = []
    gt_i = fmt.index("GT") if "GT" in fmt else -1
    dp_i = fmt.index("DP") if "DP" in fmt else -1
    gq_i = fmt.index("GQ") if "GQ" in fmt else -1
    for si, name in enumerate(samples):
        vals = f[9 + si].split(":") if len(f) > 9 + si else []

        def field(idx: int) -> str | None:
            return vals[idx] if 0 <= idx < len(vals) else None

        gt_raw = field(gt_i)
        gt = (
            [_opt_int(a) for a in gt_raw.replace("|", "/").split("/")]
            if gt_raw is not None
            else None
        )
        calls.append(
            (
                variant_id,
                chrom,
                pos,
                name,
                gt,
                _opt_int(field(dp_i)),
                _opt_int(field(gq_i)),
            )
        )
    return variant, calls


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


# Filter classes this source can evaluate at the scan (on the two
# cheap-to-extract record keys).  OR trees never reach pushFilters —
# Spark only offers top-level conjuncts.
_PUSHABLE = (EqualTo, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual)


def _eval_filter(f, value) -> bool:
    """SQL comparison semantics: any comparison against NULL is false
    (a consumed filter must drop the row exactly as Spark would)."""
    if value is None:
        return False
    if isinstance(f, EqualTo):
        return value == f.value
    if isinstance(f, GreaterThan):
        return value > f.value
    if isinstance(f, GreaterThanOrEqual):
        return value >= f.value
    if isinstance(f, LessThan):
        return value < f.value
    if isinstance(f, LessThanOrEqual):
        return value <= f.value
    if isinstance(f, In):
        return value in f.value  # In.value is the tuple of list members
    raise AssertionError(f"unpushable filter leaked: {f}")


class VcfReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vcf source requires a path: .load('file.vcf')")
        self.table = options.get("table", "calls")
        self.n_partitions_explicit = "n_partitions" in options
        self.n_partitions = int(options.get("n_partitions", "8"))
        self.samples = _parse_header(self.path)
        self.pushed: list = []

    def pushFilters(self, filters):
        """Source-side CHROM/POS filter pushdown (reference A3 +
        region-filter D7 at the ingest boundary).

        Consumed filters are evaluated per record BEFORE sample
        fan-out: a chrom/pos predicate skips the record after
        splitting only the two key fields, so a region-restricted
        ingest never pays per-sample parsing, row materialization, or
        Arrow serialization for off-region variants.  Everything else
        is yielded back for Spark to evaluate post-scan.
        """
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if isinstance(f, _PUSHABLE) and col in ("chrom", "pos"):
                self.pushed.append((col, f))
            else:
                yield f

    def _keep(self, chrom: str, pos: int | None) -> bool:
        for col, f in self.pushed:
            if not _eval_filter(f, chrom if col == "chrom" else pos):
                return False
        return True

    def partitions(self):
        size = os.path.getsize(self.path)
        if self.n_partitions_explicit:
            n = max(1, min(self.n_partitions, size))  # honor the caller
        else:
            # default: no point splitting small files
            n = max(1, min(self.n_partitions, size // (64 * 1024) or 1))
        step = size // n or 1
        bounds = [i * step for i in range(n)] + [size]
        return [_Range(bounds[i], bounds[i + 1]) for i in range(n)]

    def read(self, partition: _Range):
        # BINARY mode: a byte-range boundary may land inside a
        # multi-byte UTF-8 character — text-mode seek+readline would
        # raise UnicodeDecodeError (and text-mode tell() is slow).
        # Offsets are tracked from raw line lengths; each line is
        # owned by the partition containing its first byte.
        with open(self.path, "rb") as fh:
            fh.seek(partition.start)
            offset = partition.start
            if partition.start > 0:
                offset += len(fh.readline())  # prev partition owns it
            while offset <= partition.end:
                raw = fh.readline()
                if not raw:
                    break
                offset += len(raw)
                line = raw.decode("utf-8", errors="replace")
                if line.startswith("#") or not line.strip():
                    continue
                if self.pushed:
                    # cheap key probe: split only CHROM and POS before
                    # the full per-sample parse
                    head = line.split("\t", 2)
                    chrom = head[0]
                    pos = _opt_int(head[1]) if len(head) > 1 else None
                    if not self._keep(chrom, pos):
                        continue
                variant, calls = _parse_record(line, self.samples)
                if self.table == "variants":
                    yield variant
                else:
                    yield from calls


class VcfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "vcf"

    def schema(self) -> str:
        table = self.options.get("table", "calls")
        return VARIANTS_SCHEMA if table == "variants" else CALLS_SCHEMA

    def reader(self, schema) -> VcfReader:
        return VcfReader(dict(self.options))


def register_vcf_source(spark) -> None:
    """Register the connector once per session (and enable Python
    data-source filter pushdown, off by default in Spark 4.1, so the
    reader's pushFilters actually receives the predicates)."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # static-conf deployment: pushdown simply stays off
    from v6spark.sources import register_idempotent

    register_idempotent(spark, VcfDataSource)
