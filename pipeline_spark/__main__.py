"""CLI entry: run a config-driven pipeline.

Reference parity: MPipeline.main (reference: MPipeline.java:49-78) —
``--config=<yaml|json>`` plus FreeMarker ``args.*`` parameters; we accept
``--config path`` and repeated ``--args.key=value`` (rendered via Jinja2).

    python -m pipeline_spark --config pipeline.yaml --args.date=2026-08-13
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession

from pipeline_spark.config import load_config
from pipeline_spark.executor import run_pipeline


def build_session(master: str | None, shuffle_partitions: int | None) -> SparkSession:
    b = SparkSession.builder.appName("pipeline_spark")
    if master:
        b = b.master(master)
    b = b.config("spark.sql.adaptive.enabled", "true")
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return b.getOrCreate()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pipeline_spark")
    parser.add_argument("--config", required=True, help="pipeline config yaml/json path")
    parser.add_argument("--master", default=None, help="spark master (default: existing/local)")
    parser.add_argument("--shuffle-partitions", type=int, default=None)
    parser.add_argument("--show", action="store_true", help="show each transform output head")
    parser.add_argument("--context", default=None, help="run only modules tagged with this context")
    args, unknown = parser.parse_known_args(argv)

    template_args: dict[str, str] = {}
    for tok in unknown:
        if tok.startswith("--args."):
            k, _, v = tok.removeprefix("--args.").partition("=")
            template_args[k] = v
        else:
            parser.error(f"unknown argument: {tok}")

    spark = build_session(args.master, args.shuffle_partitions)
    config = load_config(args.config, template_args, context=args.context)
    outputs = run_pipeline(spark, config)
    if args.show:
        for name, df in outputs.items():
            print(f"== {name}")
            df.show(10, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
