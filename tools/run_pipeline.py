"""spark-submit entry point for the CDC vault pipeline.

Cluster usage (the north rule's deployment shape)::

    zip -r pyelt_spark.zip pyelt_spark
    spark-submit --py-files pyelt_spark.zip tools/run_pipeline.py \
        --events /data/transcript_change_events --vault /lake/transcript_vault \
        --mode replay --buckets 4096

    # continuous tail (Structured Streaming; exactly-once via the vault's
    # idempotent batch commits):
    spark-submit --py-files pyelt_spark.zip tools/run_pipeline.py \
        --events /data/incoming --vault /lake/transcript_vault \
        --mode tail --checkpoint /lake/_ckpt/transcript_vault

Local smoke::

    python tools/run_pipeline.py --demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", help="parquet dir of change events")
    ap.add_argument("--vault", help="vault root directory")
    ap.add_argument("--mode", choices=["replay", "tail"], default="replay")
    ap.add_argument("--checkpoint", help="streaming checkpoint dir (tail mode)")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--batch-col", default="batch_id")
    ap.add_argument("--demo", action="store_true", help="generate a small stream and replay it")
    args = ap.parse_args()

    from pyelt_spark.plans.pipeline import TranscriptVault
    from pyelt_spark.session import get_session
    from pyelt_spark.streaming.runner import MicrobatchRunner

    spark = get_session("pyelt_spark_pipeline", master=None if "SPARK_SUBMIT" in os.environ else None)

    if args.demo:
        import tempfile

        from pyelt_spark.sources.events import transcript_change_events

        events_dir = tempfile.mkdtemp(prefix="demo_events_")
        transcript_change_events(spark, 50_000, batch_size=10_000).write.mode(
            "overwrite"
        ).parquet(events_dir)
        args.events = events_dir
        args.vault = args.vault or tempfile.mkdtemp(prefix="demo_vault_")
        args.buckets = 16

    if not args.events or not args.vault:
        ap.error("--events and --vault are required (or use --demo)")

    vault = TranscriptVault(spark, args.vault, num_buckets=args.buckets)
    runner = MicrobatchRunner(vault)

    if args.mode == "replay":
        ev = spark.read.parquet(args.events)
        results = runner.replay(ev, batch_col=args.batch_col)
        for r in results:
            print(json.dumps(r.get("sat", r), default=str))
        cur = vault.current_turns()
        print(f"current state rows: {cur.count()}")
    else:
        if not args.checkpoint:
            ap.error("--checkpoint required for tail mode")
        q = runner.tail(args.events, args.checkpoint, trigger_once=False)
        q.awaitTermination()


if __name__ == "__main__":
    main()
