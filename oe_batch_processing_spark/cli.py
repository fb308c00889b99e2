"""Command-line interface for the engine.

    python -m oe_batch_processing_spark.cli ingest --file F --parser csv \
        --csv-headers "key, value" [--sink DIR] [--ledger DIR]
    python -m oe_batch_processing_spark.cli query NAME [--sf-dir DIR] [--limit N]
    python -m oe_batch_processing_spark.cli list
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="oe-batch-processing-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ingest = sub.add_parser("ingest", help="run a flat-file ingestion job")
    p_ingest.add_argument("--file", required=True)
    p_ingest.add_argument("--parser", choices=["csv", "fw"], default="csv")
    p_ingest.add_argument("--csv-headers", help="e.g. ' key, value '")
    p_ingest.add_argument("--csv-types", help="e.g. 'string, number'")
    p_ingest.add_argument("--delimiter", default=",")
    p_ingest.add_argument("--fw-layout", help="JSON list of layout objects")
    p_ingest.add_argument("--sink", help="success-channel parquet dir")
    p_ingest.add_argument("--ledger", help="BatchStatus/BatchRun parquet dir")

    p_query = sub.add_parser("query", help="run a registered query")
    p_query.add_argument("name")
    p_query.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_query.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registered queries")
    sub.add_parser(
        "counts",
        help="registered/oracled/rows-only totals — the single source of "
        "truth every committed doc count must match",
    )

    args = parser.parse_args(argv)

    import oe_batch_processing_spark.operators  # noqa: F401
    from oe_batch_processing_spark import registry

    if args.cmd == "list":
        for name in sorted(registry.QUERIES):
            kind = "oracle" if name in registry.ORACLE else "rows-only"
            print(f"{name}  [{kind}]")
        return 0

    if args.cmd == "counts":
        n = len(registry.QUERIES)
        no = len(registry.ORACLE)
        print(
            f"registered={n} oracled={no} rows_only={n - no} "
            f"rows_only_names={sorted(set(registry.QUERIES) - set(registry.ORACLE))}"
        )
        return 0

    from oe_batch_processing_spark.session import get_spark

    spark = get_spark("cli")

    if args.cmd == "query":
        fn = registry.QUERIES.get(args.name)
        if fn is None:
            print(f"unknown query '{args.name}' — see `list`", file=sys.stderr)
            return 2
        df = fn(spark, args.sf_dir)
        rows = df.limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict(recursive=True), default=str))
        print(f"# {len(rows)} row(s) shown (limit {args.limit})", file=sys.stderr)
        return 0

    if args.cmd == "ingest":
        from oe_batch_processing_spark.engine import IngestJob, ingest_summary, run_ingest
        from oe_batch_processing_spark.sources.csv_source import CsvOptions

        job = IngestJob(
            file_path=args.file,
            parser=args.parser,
            csv_options=(
                CsvOptions(
                    csv_headers=args.csv_headers,
                    csv_header_data_types=args.csv_types,
                    delimiter=args.delimiter,
                )
                if args.parser == "csv"
                else None
            ),
            fw_layout=json.loads(args.fw_layout) if args.fw_layout else None,
            sink_path=args.sink,
            ledger_dir=args.ledger,
        )
        result = run_ingest(spark, job)
        print(json.dumps(ingest_summary(result)))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
