"""CSV / delimited parser with reference fidelity (reference O2/O3/O6).

Two paths:

1. ``csv_parse`` — **fidelity path**: reproduces the reference's built-in CSV
   parser semantics exactly (lib/parsers.js:27-149): declared headers (string
   / list / dict forms), quote-aware tokenization only when the delimiter is
   ``,`` (naive split otherwise), JS ``Number()`` / strict-boolean coercion,
   per-record count validation with ``ignore_extra_*`` opt-outs, three-way
   outcome (SUCCESS / FAILED+partial-json / config error raised). Runs as an
   Arrow-batched ``mapInPandas`` because the semantics (stop-on-first-error
   partial rows, JS numerics) are not expressible with JVM expressions.

2. ``csv_scan_native`` — **scale path**: ``spark.read.csv`` with an explicit
   schema, PERMISSIVE mode and a corrupt-record column. Fully JVM-side
   (vectorized reader, pushdown-friendly); the right choice at 100 TB when
   reference-exact error strings are not required.

Config-time errors (bad headers spec, bad types) raise ``CsvConfigError`` —
the analog of the reference's FATAL kill switch for configuration problems
(lib/batchProcessing.js:633-643): they abort the run rather than mark records.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from oe_batch_processing_spark.functions.coercion import coerce_field, js_number

PARSE_RESULT_EXTRA = [
    StructField("parsed_json", StringType(), True),
    StructField("error", StringType(), True),
    StructField("statusText", StringType(), False),
]


class CsvConfigError(ValueError):
    """Configuration error — maps to the reference's FATAL outcome."""


@dataclass
class CsvOptions:
    """Mirror of the reference's csvParser options (lib/parsers.js:32-86)."""

    csv_headers: str | list[str] | dict[str, str] | None = None
    csv_header_data_types: str | list[str] | None = None
    delimiter: str = ","
    header_separator: str = ","
    ignore_extra_headers: bool = False
    ignore_extra_header_data_types: bool = False
    resolved_headers: list[str] = field(default_factory=list, repr=False)
    resolved_types: list[str] = field(default_factory=list, repr=False)

    def resolve(self) -> None:
        """Validate and normalize headers/types; raises CsvConfigError."""
        h = self.csv_headers
        if h is None:
            raise CsvConfigError("csv_headers is mandatory for the CSV parser")
        types: list[str] | None = None
        if isinstance(h, dict):
            headers = [k.strip() for k in h.keys()]
            types = [str(v).strip() for v in h.values()]
        elif isinstance(h, str):
            if h.strip() == "":
                raise CsvConfigError("csv_headers string is empty")
            headers = [p.strip() for p in h.split(self.header_separator)]
        elif isinstance(h, list):
            headers = [str(p).strip() for p in h]
        else:
            raise CsvConfigError(f"Unsupported csv_headers form: {type(h).__name__}")
        if not headers or any(x == "" for x in headers):
            raise CsvConfigError("csv_headers contains empty header names")
        for name in headers:
            # The reference rejects purely numeric header names
            # (test/test.js:699-730).
            if not math.isnan(js_number(name)):
                raise CsvConfigError(f"Invalid (numeric) header name '{name}'")

        if types is None:
            t = self.csv_header_data_types
            if t is None:
                types = ["string"] * len(headers)  # default: all string
            elif isinstance(t, str):
                types = [p.strip() for p in t.split(self.header_separator)]
            elif isinstance(t, list):
                types = [str(p).strip() for p in t]
            else:
                raise CsvConfigError(
                    f"Unsupported csv_header_data_types form: {type(t).__name__}"
                )
        for ty in types:
            if ty.lower() not in ("string", "number", "boolean"):
                raise CsvConfigError(f"Unsupported data type '{ty}'")
        if len(types) > len(headers) and not self.ignore_extra_header_data_types:
            raise CsvConfigError(
                f"More data types ({len(types)}) than headers ({len(headers)})"
            )
        if len(types) < len(headers):
            if not self.ignore_extra_header_data_types:
                raise CsvConfigError(
                    f"Fewer data types ({len(types)}) than headers ({len(headers)})"
                )
            types = types + ["string"] * (len(headers) - len(types))
        self.resolved_headers = headers
        self.resolved_types = types[: len(headers)]


def csv_to_array(text: str, delimiter: str = ",") -> list[str] | None:
    """Quote-aware CSV tokenizer (reference cSVtoArray, lib/parsers.js:152-173).

    Single- or double-quoted fields, backslash escapes inside quotes, embedded
    delimiters inside quotes, empty last field. Returns None for malformed
    input (unterminated quote / garbage after a closing quote).
    """
    fields: list[str] = []
    i, n = 0, len(text)
    while True:
        # one field
        if i < n and text[i] in "'\"":
            q = text[i]
            i += 1
            buf = []
            while i < n:
                c = text[i]
                if c == "\\" and i + 1 < n:
                    buf.append(text[i + 1])
                    i += 2
                    continue
                if c == q:
                    break
                buf.append(c)
                i += 1
            else:
                return None  # unterminated quote
            i += 1  # past closing quote
            if i < n and text[i] != delimiter:
                return None  # garbage after closing quote
            fields.append("".join(buf))
        else:
            j = text.find(delimiter, i)
            end = n if j < 0 else j
            fields.append(text[i:end])
            i = end
        if i >= n:
            return fields
        i += 1  # past delimiter
        if i == n:  # trailing delimiter => empty last field
            fields.append("")
            return fields


def parse_record(rec: str, opts: CsvOptions) -> tuple[dict, str | None]:
    """Parse one line per reference semantics.

    Returns (partial-or-full json dict, error message or None). The first
    failing field stops projection of the remaining fields but keeps the
    partial json (lib/parsers.js:132-133) — reproduced here.
    """
    headers, types = opts.resolved_headers, opts.resolved_types
    if opts.delimiter == ",":
        values = csv_to_array(rec, ",")
        if values is None:
            return {}, "Malformed CSV record"
    else:
        values = rec.split(opts.delimiter)
    if len(values) > len(headers):
        if not opts.ignore_extra_headers:
            return {}, (
                f"Record has more data fields ({len(values)}) than headers "
                f"({len(headers)})"
            )
        values = values[: len(headers)]
    if len(values) < len(headers):
        return {}, (
            f"Record has fewer data fields ({len(values)}) than headers "
            f"({len(headers)})"
        )
    out: dict = {}
    for name, ty, raw in zip(headers, types, values):
        coerced, err = coerce_field(raw, ty)
        if err is not None:
            return out, f"Field '{name}': {err}"
        out[name] = coerced
    return out, None


def result_schema(base: StructType) -> StructType:
    return StructType(list(base.fields) + list(PARSE_RESULT_EXTRA))


def csv_parse(recdata: DataFrame, opts: CsvOptions) -> DataFrame:
    """Fidelity CSV parse of a recData frame (fileName, rec, recId).

    Output adds ``parsed_json`` (JSON text of the typed record — partial on
    failure), ``error``, ``statusText`` (SUCCESS | FAILED). Runs as
    mapInPandas: Arrow batches in, no shuffle, scales linearly with input
    partitions.
    """
    opts.resolve()
    schema = result_schema(recdata.schema)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            parsed, errors, status = [], [], []
            for rec in pdf["rec"].astype(str):
                j, err = parse_record(rec, opts)
                parsed.append(json.dumps(j))
                errors.append(err)
                status.append("SUCCESS" if err is None else "FAILED")
            out = pdf.copy()
            out["parsed_json"] = parsed
            out["error"] = pd.array(errors, dtype="object")
            out["statusText"] = status
            yield out

    return recdata.mapInPandas(run, schema=schema)


_SPARK_TYPES = {"string": StringType(), "number": DoubleType(), "boolean": BooleanType()}


def typed_schema(opts: CsvOptions) -> StructType:
    """Spark schema for the declared header/type lists (string/number/boolean
    -> StringType/DoubleType/BooleanType, SURVEY.md §1.2)."""
    opts.resolve()
    return StructType(
        [
            StructField(h, _SPARK_TYPES[t.lower()], True)
            for h, t in zip(opts.resolved_headers, opts.resolved_types)
        ]
    )


def csv_scan_native(
    spark: SparkSession,
    path: str | list[str],
    opts: CsvOptions,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Scale-path CSV scan: JVM vectorized reader, explicit schema, PERMISSIVE
    mode with corrupt-record capture. Malformed rows land with all data
    columns NULL and the raw line in ``corrupt_col`` — route them with
    ``outcome.route_native``."""
    schema = typed_schema(opts)
    full = StructType(list(schema.fields) + [StructField(corrupt_col, StringType(), True)])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("sep", opts.delimiter)
        .option("quote", '"')
        .option("escape", "\\")
        .option("header", "false")
        .csv(path)
    )
