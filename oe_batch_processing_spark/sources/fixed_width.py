"""Fixed-width parser (reference O4).

Reference semantics (lib/parsers.js:176-266), reproduced exactly:
  - layout spec: non-empty list of ``{fieldName, type, startPosition,
    endPosition}``; every key validated at config time (=> FwConfigError,
    the FATAL analog).
  - **strict length**: record length must equal the last field's
    ``endPosition`` *exactly* — both longer and shorter records are FAILED
    records, not truncated/padded (lib/parsers.js:224-227).
  - per-field ``substring(startPosition-1, endPosition)``, whitespace trim,
    JS-fidelity type coercion with stop-on-first-error partial rows.

Two paths, as with CSV:
  - ``fw_parse`` — fidelity mapInPandas parse of a recData frame.
  - ``fw_project_native`` — JVM-side ``substring``+``cast`` projection for
    well-formed data at scale (whole-stage codegen, no Python).
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from oe_batch_processing_spark.functions.coercion import coerce_field
from oe_batch_processing_spark.sources.csv_source import result_schema


class FwConfigError(ValueError):
    """Layout-spec error — maps to the reference's FATAL outcome."""


@dataclass(frozen=True)
class FwField:
    field_name: str
    type: str
    start_position: int  # 1-based, inclusive
    end_position: int  # 1-based, inclusive


def validate_layout(layout: list[dict] | list[FwField]) -> list[FwField]:
    """Validate the layout spec (reference lib/parsers.js:182-216)."""
    if not isinstance(layout, list) or not layout:
        raise FwConfigError("Fixed-width layout must be a non-empty list")
    out: list[FwField] = []
    for i, entry in enumerate(layout):
        if isinstance(entry, FwField):
            f = entry
        else:
            if not isinstance(entry, dict):
                raise FwConfigError(f"Layout entry {i} is not an object")
            missing = {"fieldName", "type", "startPosition", "endPosition"} - set(entry)
            if missing:
                raise FwConfigError(f"Layout entry {i} missing keys: {sorted(missing)}")
            f = FwField(
                field_name=str(entry["fieldName"]).strip(),
                type=str(entry["type"]).strip(),
                start_position=entry["startPosition"],
                end_position=entry["endPosition"],
            )
        if not f.field_name:
            raise FwConfigError(f"Layout entry {i} has an empty fieldName")
        if f.type.lower() not in ("string", "number", "boolean"):
            raise FwConfigError(f"Layout entry {i}: unsupported type '{f.type}'")
        if not isinstance(f.start_position, int) or not isinstance(f.end_position, int):
            raise FwConfigError(f"Layout entry {i}: positions must be integers")
        if f.start_position < 1 or f.end_position < f.start_position:
            raise FwConfigError(
                f"Layout entry {i}: invalid positions "
                f"[{f.start_position}, {f.end_position}]"
            )
        out.append(f)
    return out


def parse_record(rec: str, layout: list[FwField]) -> tuple[dict, str | None]:
    """Parse one fixed-width line per reference semantics."""
    expected_len = layout[-1].end_position
    if len(rec) != expected_len:
        return {}, (
            f"Record length {len(rec)} does not match layout length {expected_len}"
        )
    out: dict = {}
    for f in layout:
        raw = rec[f.start_position - 1 : f.end_position]
        coerced, err = coerce_field(raw, f.type)
        if err is not None:
            return out, f"Field '{f.field_name}': {err}"
        out[f.field_name] = coerced
    return out, None


def fw_parse(recdata: DataFrame, layout: list[dict] | list[FwField]) -> DataFrame:
    """Fidelity fixed-width parse of a recData frame (fileName, rec, recId).

    Adds ``parsed_json`` / ``error`` / ``statusText`` like csv_parse.
    """
    spec = validate_layout(layout)
    schema = result_schema(recdata.schema)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            parsed, errors, status = [], [], []
            for rec in pdf["rec"].astype(str):
                j, err = parse_record(rec, spec)
                parsed.append(json.dumps(j))
                errors.append(err)
                status.append("SUCCESS" if err is None else "FAILED")
            out = pdf.copy()
            out["parsed_json"] = parsed
            out["error"] = pd.array(errors, dtype="object")
            out["statusText"] = status
            yield out

    return recdata.mapInPandas(run, schema=schema)


_NATIVE_CAST = {"string": "string", "number": "double", "boolean": "boolean"}


def fw_columns(layout: list[dict] | list[FwField], src: str = "rec") -> list[Column]:
    """JVM-side substring+trim+cast projection for a validated layout."""
    spec = validate_layout(layout)
    cols = []
    for f in spec:
        width = f.end_position - f.start_position + 1
        c = F.trim(F.substring(F.col(src), f.start_position, width))
        cols.append(c.cast(_NATIVE_CAST[f.type.lower()]).alias(f.field_name))
    return cols


def fw_project_native(
    recdata: DataFrame, layout: list[dict] | list[FwField], strict_length: bool = True
) -> DataFrame:
    """Scale-path fixed-width projection (whole-stage codegen, no Python).

    With ``strict_length`` the reference's exact-length rule becomes a filter;
    length-violating rows are dropped here (route them separately via
    ``F.length != N`` if an error channel is needed).
    """
    spec = validate_layout(layout)
    df = recdata
    if strict_length:
        df = df.filter(F.length("rec") == spec[-1].end_position)
    keep = [c for c in ("fileName", "recId") if c in df.columns]
    return df.select(*keep, *fw_columns(spec))
