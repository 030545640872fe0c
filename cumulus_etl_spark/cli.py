"""Command-line interface (parity with cumulus_etl/cli.py:16-110).

Verbs:
  etl INPUT OUTPUT PHI   de-identifying ETL run (the default)
  init OUTPUT            create empty tables with full schemas
  convert ORIGINAL TARGET  re-load batched NDJSON output into a lake
  sample INPUT N         uniform random sample of clinical notes
  etl-i2b2 INPUT OUTPUT PHI  i2b2 CSV dump → de-identified lake
"""

from __future__ import annotations

import argparse
import json
import sys

from cumulus_etl_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="cumulus-etl-spark")
    sub = parser.add_subparsers(dest="verb", required=True)

    p_etl = sub.add_parser("etl", help="de-identifying ETL run")
    p_etl.add_argument("input_dir")
    p_etl.add_argument("output_dir")
    p_etl.add_argument("phi_dir")
    p_etl.add_argument("--task", action="append", dest="tasks")
    p_etl.add_argument("--philter", action="store_true")
    p_etl.add_argument("--export-group", dest="group_name")
    p_etl.add_argument("--export-timestamp", dest="export_datetime")
    p_etl.add_argument(
        "--output-format", choices=("merged", "ndjson"), default="merged"
    )
    p_etl.add_argument("--batch-size", type=int, default=100_000)
    p_etl.add_argument(
        "--errors-to",
        dest="errors_to",
        default=None,
        help="explicit dir for quarantined raw rows (default: <phi_dir>/errors; "
        "never the de-identified output dir)",
    )

    p_init = sub.add_parser("init", help="create empty tables with schemas")
    p_init.add_argument("output_dir")
    p_init.add_argument("--task", action="append", dest="tasks")

    p_conv = sub.add_parser("convert", help="NDJSON output folder -> lake")
    p_conv.add_argument("original_dir")
    p_conv.add_argument("target_dir")

    p_i2b2 = sub.add_parser("etl-i2b2", help="i2b2 CSV dump -> de-identified lake")
    p_i2b2.add_argument("input_dir")
    p_i2b2.add_argument("output_dir")
    p_i2b2.add_argument("phi_dir")
    p_i2b2.add_argument("--philter", action="store_true")

    p_sample = sub.add_parser("sample", help="sample N clinical notes")
    p_sample.add_argument("input_dir")
    p_sample.add_argument("count", type=int)
    p_sample.add_argument("--seed", type=int, default=42)
    p_sample.add_argument("--out", default=None, help="write NDJSON here instead of stdout count")

    args = parser.parse_args(argv)
    spark = get_spark(app_name=f"cumulus-etl-spark-{args.verb}")

    if args.verb == "etl":
        from cumulus_etl_spark.etl import run_etl

        summary = run_etl(
            spark,
            args.input_dir,
            args.output_dir,
            args.phi_dir,
            tasks=args.tasks,
            philter=args.philter,
            group_name=args.group_name,
            export_datetime=args.export_datetime,
            output_format=args.output_format,
            batch_size=args.batch_size,
            errors_to=args.errors_to,
        )
        print(json.dumps(summary, indent=2))
        return 0 if summary["success"] else 1
    if args.verb == "init":
        from cumulus_etl_spark.etl import run_init

        print(json.dumps({"created": run_init(spark, args.output_dir, tasks=args.tasks)}))
        return 0
    if args.verb == "convert":
        from cumulus_etl_spark.etl import run_convert

        print(json.dumps({"converted": run_convert(spark, args.original_dir, args.target_dir)}))
        return 0
    if args.verb == "etl-i2b2":
        from cumulus_etl_spark.etl.i2b2_pipeline import run_etl_i2b2

        summary = run_etl_i2b2(
            spark, args.input_dir, args.output_dir, args.phi_dir, philter=args.philter
        )
        print(json.dumps(summary, indent=2))
        return 0 if summary["success"] else 1
    if args.verb == "sample":
        from cumulus_etl_spark.etl.sample import sample_notes

        sampled = sample_notes(spark, args.input_dir, args.count, seed=args.seed)
        if args.out:
            sampled.write.mode("overwrite").json(args.out)
            print(json.dumps({"written": args.out}))
        else:
            print(json.dumps({"sampled": sampled.count()}))
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
